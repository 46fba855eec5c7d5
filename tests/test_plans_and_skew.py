"""Physical-plan properties (Catalyst integration) + skew-safety.

The scale story isn't just wall clock: these tests pin the plan shapes —
predicate pushdown reaches the parquet scan, column pruning trims ReadSchema,
small dims broadcast, and hot LSH buckets produce O(n) star edges instead of
O(n^2) pairs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from product_deduplication_spark.config import DedupConfig
from product_deduplication_spark.functions.features import with_features
from product_deduplication_spark.operators.lsh import candidate_pairs
from product_deduplication_spark.plans import queries as Q


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    plan = _plan(Q.q_scan_filter_project(spark, sf_dir))
    assert "PushedFilters" in plan
    # the quantity predicate must be pushed, not evaluated post-scan only
    assert "GreaterThan(l_quantity" in plan, plan[:2000]


def test_column_pruning_trims_read_schema(spark, sf_dir):
    plan = _plan(Q.q_scan_filter_project(spark, sf_dir))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan[:1000]
    line = read_schema[0]
    # only the 4 referenced columns are read — not l_extendedprice etc.
    assert "l_extendedprice" not in line
    assert "l_quantity" in line and "l_orderkey" in line


def test_small_dim_broadcasts(spark, sf_dir):
    plan = _plan(Q.q_join_inner(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_hot_bucket_produces_linear_edges(spark):
    """1000 byte-identical docs share every band: a naive pair join emits
    ~499,500 pairs; the hub-star path must emit exactly n-1."""
    n = 1000
    docs = pd.DataFrame(
        {"doc_id": range(n), "text": ["identical boilerplate page text " * 10] * n}
    )
    cfg = DedupConfig(shuffle_partitions=8, bucket_cap=64)
    feats = with_features(spark.createDataFrame(docs), cfg).select(
        "doc_id", "shingles", "minhash", "simhash"
    )
    pairs = candidate_pairs(feats, cfg)
    assert pairs.count() == n - 1


def test_mixed_hot_and_normal_buckets(spark):
    """Hot group star-connects; small distinct near-dup pairs still pair up."""
    import random

    rng = random.Random(7)
    vocab = [f"w{k}" for k in range(3000)]
    hot = ["identical boilerplate page text " * 10] * 200
    normal = [" ".join(rng.sample(vocab, 60)) for _ in range(20)]
    docs = pd.DataFrame({"doc_id": range(220), "text": hot + normal})
    cfg = DedupConfig(shuffle_partitions=8, bucket_cap=64)
    feats = with_features(spark.createDataFrame(docs), cfg).select(
        "doc_id", "shingles", "minhash", "simhash"
    )
    n_pairs = candidate_pairs(feats, cfg).count()
    # hot star: 199 edges; normal docs are mutually dissimilar -> few extras
    assert 199 <= n_pairs <= 199 + 40
