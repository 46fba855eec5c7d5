"""Snapshot-incremental dedup: fold new documents into existing clusters.

Capability analog of the reference's canonical upsert
(``reference/clean_canonical.py:102-209,296-338``, V11 direct-match short
circuit) at webtext scale:

1. **Exact short circuit** — new docs whose ``sha2(text)`` matches an
   already-clustered doc join that cluster without any similarity work
   (V11: "normalized name already a canonical member → link without
   similarity").
2. **Feature reuse** — MinHash/shingles are computed ONLY for genuinely new
   docs; prior snapshots' features are read back from the catalog. At 10^12
   docs this is the difference between re-hashing the corpus and hashing
   the daily delta. DOCS/FEATURES are *delta stages*: each batch appends
   only its new rows and readers union the snapshot list
   (``SnapshotCatalog.read_stage_union``) — never a full rewrite.
3. **Delta-restricted candidates** — LSH banding runs in delta mode
   (``candidate_pairs(..., delta_ids=new ids)``): only buckets touching a
   new doc are considered and only (new, any) pairs are emitted. Old-old
   edges were found by the batch that added the younger doc, so per-batch
   cost is proportional to the delta, not the corpus.
4. **Cluster stitching** — verified new edges union prior-assignment-edges
   (doc→cluster_id edges keep old clusters intact and merge them when a
   new doc bridges two), then connected components reassign.

``foreach_batch_dedup`` wraps this as a Structured Streaming sink
(``writeStream.foreachBatch``) so a stream of page snapshots continuously
maintains the cluster table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from product_deduplication_spark.catalog import SnapshotCatalog
from product_deduplication_spark.config import DedupConfig
from product_deduplication_spark.functions.features import with_features
from product_deduplication_spark.operators.connected_components import assign_clusters
from product_deduplication_spark.operators.lsh import candidate_pairs
from product_deduplication_spark.operators.verify import verify_pairs
from product_deduplication_spark.pipeline import pick_winners, prepare_docs

DOCS_STAGE = "inc_docs"
FEATURES_STAGE = "inc_features"
CLUSTERS_STAGE = "inc_clusters"


def incremental_dedup(
    spark, catalog: SnapshotCatalog, new_docs: DataFrame, cfg: DedupConfig | None = None
) -> DataFrame:
    """Process a batch of new docs against the catalog state; returns and
    snapshots the updated full cluster assignment."""
    cfg = cfg or DedupConfig()
    new_prepared = prepare_docs(new_docs, cfg).select("url", "doc_id", "text")

    bootstrap = not catalog.has_stage(CLUSTERS_STAGE)
    if bootstrap:
        all_docs = new_prepared
        old_feats = None
        prior_edges = None
        truly_new = new_prepared
    else:
        # union of ALL prior delta snapshots — not just the latest batch
        # (a batch-3 doc must still LSH-collide with a batch-1 doc)
        old_docs = catalog.read_stage_union(DOCS_STAGE)
        old_clusters = catalog.read_stage(CLUSTERS_STAGE)
        old_feats = catalog.read_stage_union(FEATURES_STAGE)
        # idempotence: drop re-submitted urls
        truly_new = new_prepared.join(old_docs.select("url"), "url", "left_anti")
        all_docs = old_docs.unionByName(truly_new)
        # prior assignments as edges keep existing clusters connected
        prior_edges = old_clusters.select(
            F.col("doc_id").alias("src"), F.col("cluster_id").alias("dst")
        )

    # feature reuse: hash ONLY the new docs
    new_feats = with_features(truly_new.select("doc_id", "text"), cfg).select(
        "doc_id", "shingles", "minhash", "simhash", "bands"
    )
    feats = new_feats if old_feats is None else old_feats.unionByName(new_feats)
    feats = feats.persist()

    # exact short circuit (V11): cheap sha2 equality, no LSH needed for hits.
    # Delta-restricted like LSH: only hash groups containing a new doc emit
    # edges (old-old exact edges are already inside prior clusters).
    new_ids = truly_new.select("doc_id")
    hashed = all_docs.select("doc_id", F.sha2("text", 256).alias("h"))
    new_hashes = hashed.join(new_ids, "doc_id", "left_semi").select("h").distinct()
    touched = hashed.join(new_hashes, "h", "left_semi")
    hubs = touched.groupBy("h").agg(F.min("doc_id").alias("hub"), F.count("*").alias("n"))
    exact_edges = (
        touched.join(hubs.where(F.col("n") > 1), "h")
        .where(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("src"), F.col("doc_id").alias("dst"))
    )

    # delta mode: only (new, any) candidate pairs — per-batch LSH cost is
    # proportional to the delta, not the accumulated corpus
    pairs = candidate_pairs(feats, cfg, delta_ids=None if bootstrap else new_ids)
    near = verify_pairs(pairs, feats, cfg).select("src", "dst")

    edges = exact_edges.unionByName(near)
    if prior_edges is not None:
        edges = edges.unionByName(prior_edges)
    clusters = pick_winners(
        assign_clusters(all_docs, edges.dropDuplicates(["src", "dst"]), "doc_id")
    ).select("url", "doc_id", "cluster_id", "is_winner", "text")

    # delta writes: only the batch's new rows (read path unions snapshots)
    catalog.write_stage(truly_new, DOCS_STAGE, metrics={"new_docs": truly_new.count()})
    catalog.write_stage(new_feats, FEATURES_STAGE)
    entry = catalog.write_stage(
        clusters.drop("text"), CLUSTERS_STAGE, metrics={"bootstrap": bootstrap}
    )
    feats.unpersist()
    return catalog.read_stage(CLUSTERS_STAGE, entry["snapshot_id"])


def foreach_batch_dedup(catalog_root: str, cfg: DedupConfig | None = None):
    """Structured Streaming sink: ``stream.writeStream.foreachBatch(
    foreach_batch_dedup('/work'))`` — each micro-batch of new pages folds
    into the cluster state transactionally (one catalog snapshot per batch).
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cat = SnapshotCatalog(spark, catalog_root)
        incremental_dedup(spark, cat, batch_df, cfg)

    return _sink
