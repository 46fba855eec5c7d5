"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``product_deduplication_spark.plans.queries``; each
carries the SURVEY.md §2 operator ids and reference file:line citations.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Spark python workers must be able to import the package too
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{_REPO}{os.pathsep}{_pp}" if _pp else _REPO


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full MinHash/LSH near-dup pipeline over sf0.001 documents
    (wrapped into the (url, warc_ts, html, text, lang) input_hint shape) →
    cluster assignments with winners."""
    from product_deduplication_spark.plans.queries import q_minhash_dedup_clusters

    return q_minhash_dedup_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from product_deduplication_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from product_deduplication_spark.plans.queries import ORACLES

    return dict(ORACLES)
