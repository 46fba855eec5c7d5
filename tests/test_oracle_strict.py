"""Strict (bit-exact) oracle comparison audit.

The driver compares via order-insensitive value HASH — so float columns must
match DuckDB bit-for-bit after both sides' ROUND(). This test enforces exact
equality (no epsilon) for every oracle query, catching any rounding-mode or
summation-order divergence before the driver does.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from product_deduplication_spark.oracle.compare import duckdb_conn  # noqa: E402

SF01 = "/root/testdata/sf0.01"
_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_conn(SF01)
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_bit_exact_vs_duckdb(spark, duck, name):
    a = _norm(_QUERIES[name](spark, SF01).toPandas())
    b = _norm(duck.execute(_ORACLES[name]).df())
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
