"""Local replica of the driver's correctness gate: every queries() entry vs
its DuckDB oracle at sf0.01 (row count + schema + order-insensitive values).

The (spark, duckdb) result pair for each query comes from the session-scoped
``oracle_frames`` cache in conftest.py, shared with test_oracle_strict so the
expensive Spark side (including the O(n^2) self-check truth joins) runs once
per pytest session, not once per test file.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from product_deduplication_spark.oracle.compare import compare_frames  # noqa: E402

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert {"url", "doc_id", "cluster_id", "is_winner"} <= set(df.columns)


def test_every_query_has_oracle():
    # full coverage both directions: the driver records a green (rows +
    # schema + value-hash) row for every registry entry — no rows-only rows
    assert set(_ORACLES) == set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(oracle_frames, name):
    spark_pdf, duck_pdf = oracle_frames(name)
    problems = compare_frames(spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
