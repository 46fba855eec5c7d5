"""Exact-duplicate detection via content hash (cheap first pass).

Webtext analog of the reference's exact-raw-name duplicate pass
(``reference/heuristic_ucpc_dups.py:232-264``, SURVEY.md V8): instead of
grouping on raw_item_name we group on ``sha2(text, 256)``. Emitting star
edges (min doc_id ↔ member) keeps a group of n identical docs at O(n) edges —
no pairwise blowup for boilerplate pages, and connectivity under CC is
identical to the full clique.

Scale: one hash-shuffle on a 64-char key. min/count come from window
functions over that single exchange — the former groupBy + join-back scanned
(and sha2-hashed) the corpus twice and shuffled the (node, h) relation twice
(unique content hashes defeat partial aggregation, so the agg exchange
carried ~one row per doc anyway). No skew issue beyond a single pathological
identical-page key, which the star construction already bounds to O(n) rows
on one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_duplicate_edges(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Edges (src, dst, method='exact', similarity=1.0) linking each doc to
    the min-id doc with byte-identical text."""
    hashed = df.select(F.col(id_col).alias("node"), F.sha2(F.col(text_col), 256).alias("h"))
    w = Window.partitionBy("h")
    return (
        hashed.select(
            "node",
            F.min("node").over(w).alias("hub"),
            F.count("*").over(w).alias("n"),
        )
        .where((F.col("n") > 1) & (F.col("node") != F.col("hub")))
        .select(
            F.col("hub").alias("src"),
            F.col("node").alias("dst"),
            F.lit("exact").alias("method"),
            F.lit(1.0).alias("similarity"),
        )
    )


def exact_duplicate_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(group_hash, doc_id, group_size) for groups with >1 member — the
    direct query-surface form (used by __spark_entry__ with a DuckDB oracle).
    """
    hashed = df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("text_hash"))
    return (
        hashed.withColumn(
            "group_size", F.count("*").over(Window.partitionBy("text_hash"))
        )
        .where(F.col("group_size") > 1)
        .select("text_hash", F.col(id_col), "group_size")
    )
