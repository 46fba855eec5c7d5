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
    cluster assignments with winners. (The registry twin
    ``minhash_dedup_clusters`` reduces this same pipeline to an
    oracle-pinned self-check row; entry() returns the full assignment.)"""
    from pyspark.sql import functions as F

    from product_deduplication_spark.config import DedupConfig
    from product_deduplication_spark.datagen import wrap_documents_spark
    from product_deduplication_spark.pipeline import run_dedup

    docs = wrap_documents_spark(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    cfg = DedupConfig(
        shuffle_partitions=int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    res = run_dedup(docs, cfg)
    return res.clusters.select(
        "url", "doc_id", "cluster_id", F.col("is_winner").cast("int").alias("is_winner")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from product_deduplication_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from product_deduplication_spark.plans.queries import ORACLES

    return dict(ORACLES)
