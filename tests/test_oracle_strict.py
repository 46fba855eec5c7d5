"""Strict (bit-exact) oracle comparison audit.

The driver compares via order-insensitive value HASH — so float columns must
match DuckDB bit-for-bit after both sides' ROUND(). This test enforces exact
equality (no epsilon) for every oracle query, catching any rounding-mode or
summation-order divergence before the driver does.

Result frames come from the session-scoped ``oracle_frames`` cache in
conftest.py (shared with test_entry_oracle), so each query's Spark side runs
once per pytest session.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

_ORACLES = entry_mod.oracle_sql()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_bit_exact_vs_duckdb(oracle_frames, name):
    spark_pdf, duck_pdf = oracle_frames(name)
    a, b = _norm(spark_pdf), _norm(duck_pdf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            eq = (av == bv) | (av.isna() & bv.isna())
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
        assert eq.all(), (
            f"{name}.{c}: first bit-diff at row {eq.idxmin()}: "
            f"{av[eq.idxmin()]!r} vs {bv[eq.idxmin()]!r}"
        )
