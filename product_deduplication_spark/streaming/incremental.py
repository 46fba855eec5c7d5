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
   the daily delta.
3. **Delta-restricted candidates** — LSH banding runs in delta mode
   (``candidate_pairs(..., delta_ids=new ids)``): only buckets touching a
   new doc are considered and only (new, any) pairs are emitted. Old-old
   edges were found by the batch that added the younger doc, so per-batch
   cost is proportional to the delta, not the corpus.
4. **Cluster stitching** — verified new edges union prior-assignment-edges
   (doc→cluster_id edges keep old clusters intact and merge them when a
   new doc bridges two), then connected components reassign.

**Every stage is a delta stage.** DOCS/FEATURES snapshots hold only the
batch's new rows; CLUSTERS snapshots hold only assignments that CHANGED
this batch (new docs + old docs whose cluster_id or winner flag flipped via
bridging). Readers reconstruct current state from the snapshot list:
docs/features dedupe by doc_id, clusters resolve latest-wins by
``batch_seq`` (:func:`read_clusters`). At 10^12 docs a batch therefore
writes O(delta), never O(corpus) — the round-2 implementation rewrote the
full assignment every batch.

**Crash recovery.** Within a batch the write order is FEATURES → CLUSTERS →
DOCS, and *idempotence keys off DOCS* (the last write = the commit marker):
a resubmitted url is "new" until its DOCS row exists. A crash between any
two writes therefore causes the retry to reprocess the batch in full — the
half-written features/clusters rows are superseded by doc_id-dedup /
latest-wins on read. (The round-2 ordering wrote DOCS first; a crash after
it left resubmitted docs permanently unclustered, because delta mode
assumes every DOCS member already has an assignment.)

``foreach_batch_dedup`` wraps this as a Structured Streaming sink
(``writeStream.foreachBatch``) so a stream of page snapshots continuously
maintains the cluster table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from product_deduplication_spark.caching import CacheScope
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
# catalog layout version. 2 = all-delta stages + batch_seq'd clusters +
# precomputed band hashes in features; 3 = 32-bit shingle sets (array<int>).
# Catalogs written by older code would silently corrupt state (or fail the
# features union with a type mismatch) — refuse loudly instead.
FORMAT_VERSION = 3


def read_clusters(catalog: SnapshotCatalog) -> DataFrame:
    """Current full assignment from the delta snapshots: latest-wins per
    doc_id by ``batch_seq`` (the Iceberg-style merge-on-read). Reads the
    ACTIVE snapshots only, so after a compaction the merge-on-read window
    is one full-state snapshot plus the deltas since."""
    entries = catalog.active_snapshots(CLUSTERS_STAGE)
    if not entries:
        raise FileNotFoundError(f"no snapshot for stage {CLUSTERS_STAGE!r}")
    union = catalog.spark.read.parquet(*[e["path"] for e in entries])
    w = Window.partitionBy("doc_id").orderBy(F.desc("batch_seq"))
    return (
        union.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "batch_seq")
    )


def _check_format(catalog: SnapshotCatalog) -> None:
    entry = catalog.latest(DOCS_STAGE)
    fmt = (entry.get("metrics") or {}).get("format") if entry else None
    if fmt != FORMAT_VERSION:
        raise RuntimeError(
            f"incremental catalog at {catalog.root!r} has format {fmt!r}, this "
            f"code writes format {FORMAT_VERSION}: old snapshots lack the "
            "precomputed band-hash column and use full-rewrite clusters "
            "snapshots. Rebuild the catalog (re-run bootstrap) or migrate: "
            "recompute features with band_hash_array and rewrite clusters "
            "as a batch_seq=0 delta."
        )


def _expected_latest(catalog: SnapshotCatalog, stage: str) -> str | None:
    entry = catalog.latest(stage)
    return entry["snapshot_id"] if entry else None


def compact_snapshots(catalog: SnapshotCatalog) -> None:
    """FULL compaction: rewrite each delta stage's CURRENT state as one
    ``replaces_prior`` snapshot, truncating the read-side union (the
    latest-wins / doc_id-dedup window otherwise grows with batch count —
    merge-on-read cost must be bounded by state size, not history length;
    Iceberg analog: a rewrite-data-files compaction commit). I/O is
    O(state) — use :func:`compact_deltas` when the accumulated deltas are
    small relative to the base (size-tiered policy in incremental_dedup).

    Stages compact independently and each is committed by its manifest
    append AFTER its parquet write, so a crash mid-compaction leaves every
    stage readable (at worst an orphan data directory). The full manifest
    history stays time-travelable via ``catalog.snapshots``.

    Concurrency: compaction assumes a single writer per stage; the commit
    carries the latest snapshot id observed at read time, so a delta batch
    landing mid-compaction raises ``ConcurrentSnapshotError`` instead of
    being silently truncated out of the active set."""
    fmt = {"format": FORMAT_VERSION, "compaction": True}
    expected = {s: _expected_latest(catalog, s) for s in (DOCS_STAGE, FEATURES_STAGE, CLUSTERS_STAGE)}
    docs = catalog.read_stage_union(DOCS_STAGE).dropDuplicates(["doc_id"])
    feats = catalog.read_stage_union(FEATURES_STAGE).dropDuplicates(["doc_id"])
    clusters = read_clusters(catalog).withColumn(
        "batch_seq", F.lit(len(catalog.snapshots(CLUSTERS_STAGE)))
    )
    catalog.write_stage(feats, FEATURES_STAGE, metrics=fmt, replaces_prior=True,
                        expected_latest_id=expected[FEATURES_STAGE])
    catalog.write_stage(clusters, CLUSTERS_STAGE, metrics=fmt, replaces_prior=True,
                        expected_latest_id=expected[CLUSTERS_STAGE])
    catalog.write_stage(docs, DOCS_STAGE, metrics=fmt, replaces_prior=True,
                        expected_latest_id=expected[DOCS_STAGE])


def compact_deltas(catalog: SnapshotCatalog) -> None:
    """MINOR (size-tiered) compaction: merge ONLY the accumulated delta
    snapshots into one snapshot per stage via ``replaces_ids``, leaving the
    base ``replaces_prior`` snapshot untouched. I/O is proportional to the
    DELTA volume, not the state — at 10^12 docs rewriting the full state
    every N batches is a major job, but the deltas between compactions stay
    small, so this bounds the merge-on-read width (base + 1 merged delta +
    recents) at delta cost.

    Correctness: CLUSTERS rows keep their original ``batch_seq`` after
    latest-wins within the merged window, so the reader's latest-wins
    against the base (older seqs) and future deltas (newer seqs) is
    unchanged; DOCS/FEATURES merge by doc_id-dedup, same as the read path.
    Same single-writer guard as full compaction."""
    fmt = {"format": FORMAT_VERSION, "compaction": "minor"}
    for stage in (FEATURES_STAGE, CLUSTERS_STAGE, DOCS_STAGE):
        expected = _expected_latest(catalog, stage)
        active = catalog.active_snapshots(stage)
        deltas = [e for e in active if not e.get("replaces_prior")]
        if len(deltas) < 2:
            continue
        union = catalog.spark.read.parquet(*[e["path"] for e in deltas])
        if stage == CLUSTERS_STAGE:
            w = Window.partitionBy("doc_id").orderBy(F.desc("batch_seq"))
            merged = (
                union.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            merged = union.dropDuplicates(["doc_id"])
        catalog.write_stage(
            merged,
            stage,
            metrics=fmt,
            replaces_ids=[e["snapshot_id"] for e in deltas],
            expected_latest_id=expected,
        )


def incremental_dedup(
    spark,
    catalog: SnapshotCatalog,
    new_docs: DataFrame,
    cfg: DedupConfig | None = None,
    auto_compact: int | None = 16,
    compact_tier_fraction: float = 0.5,
) -> DataFrame:
    """Process a batch of new docs against the catalog state; snapshots the
    per-batch deltas and returns the updated full cluster assignment.

    ``auto_compact``: when the ACTIVE snapshot count of the clusters stage
    exceeds this after the batch commits, a compaction runs — bounding every
    subsequent read's union width. None disables. The compaction is
    SIZE-TIERED: if the accumulated delta rows are under
    ``compact_tier_fraction`` of the base snapshot's rows, only the deltas
    are merged (``compact_deltas`` — I/O proportional to delta volume);
    otherwise, or when no base exists yet, the full state is rewritten
    (``compact_snapshots``). At 10^12 docs this is the difference between a
    bounded housekeeping job every N batches and an O(corpus) rewrite."""
    cfg = cfg or DedupConfig()
    new_prepared = prepare_docs(new_docs, cfg).select("url", "doc_id", "text")

    # DOCS is the commit marker (written LAST) — its presence defines both
    # bootstrap and which docs count as already-processed
    bootstrap = not catalog.has_stage(DOCS_STAGE)
    if bootstrap:
        all_docs = new_prepared
        old_feats = None
        old_assign = None
        prior_edges = None
        truly_new = new_prepared
    else:
        _check_format(catalog)
        # union of ALL prior delta snapshots — not just the latest batch
        # (a batch-3 doc must still LSH-collide with a batch-1 doc).
        # dropDuplicates(doc_id): a crash between FEATURES and DOCS writes
        # leaves the retried batch's features twice across snapshots.
        old_docs = catalog.read_stage_union(DOCS_STAGE).dropDuplicates(["doc_id"])
        old_feats = catalog.read_stage_union(FEATURES_STAGE).dropDuplicates(["doc_id"])
        old_assign = read_clusters(catalog)
        # idempotence: drop re-submitted urls that COMMITTED (have a DOCS row)
        truly_new = new_prepared.join(old_docs.select("url"), "url", "left_anti")
        all_docs = old_docs.unionByName(truly_new)
        # prior assignments as edges keep existing clusters connected
        prior_edges = old_assign.select(
            F.col("doc_id").alias("src"), F.col("cluster_id").alias("dst")
        )

    # feature reuse: hash ONLY the new docs
    new_feats = with_features(truly_new.select("doc_id", "text"), cfg).select(
        "doc_id", "shingles", "minhash", "simhash", "bands"
    )
    feats = new_feats if old_feats is None else old_feats.unionByName(new_feats)
    # every cache this batch creates (features + candidate_pairs internals)
    # is released before returning — a streaming job runs this once per
    # micro-batch in one long-lived session, so leaked CacheManager entries
    # would accumulate unboundedly (see caching.py)
    scope = CacheScope()
    feats = scope.persist(feats)

    # exact short circuit (V11): cheap sha2 equality, no LSH needed for hits.
    # Delta-restricted like LSH: only hash groups containing a new doc emit
    # edges (old-old exact edges are already inside prior clusters).
    new_ids = truly_new.select("doc_id")
    # one window over the (doc_id, h) relation replaces the former
    # semi-join + groupBy + join-back chain (4 extra exchanges of the
    # corpus-hash relation): per hash group, min/count give the star shape
    # and max(is_new) restricts to groups touching the delta, exactly as
    # the new_hashes semi-join did
    hashed = all_docs.select("doc_id", F.sha2("text", 256).alias("h")).join(
        new_ids.withColumn("_n", F.lit(True)), "doc_id", "left"
    )
    hw = Window.partitionBy("h")
    exact_edges = (
        hashed.select(
            "doc_id",
            F.min("doc_id").over(hw).alias("hub"),
            F.count("*").over(hw).alias("n"),
            F.max(F.coalesce(F.col("_n"), F.lit(False))).over(hw).alias("_touched"),
        )
        .where(F.col("_touched") & (F.col("n") > 1) & (F.col("doc_id") != F.col("hub")))
        .select(F.col("hub").alias("src"), F.col("doc_id").alias("dst"))
    )

    # delta mode: only (new, any) candidate pairs — per-batch LSH cost is
    # proportional to the delta, not the accumulated corpus
    pairs = candidate_pairs(
        feats, cfg, delta_ids=None if bootstrap else new_ids, scope=scope
    )
    near = verify_pairs(pairs, feats, cfg).select("src", "dst")

    edges = exact_edges.unionByName(near)
    if prior_edges is not None:
        edges = edges.unionByName(prior_edges)
    # _text_len below the label join: keeps the text payload out of the
    # join exchange (this select prunes it from the window already)
    clusters = pick_winners(
        assign_clusters(
            all_docs.withColumn("_text_len", F.length("text")),
            edges.dropDuplicates(["src", "dst"]),
            "doc_id",
        )
    ).select("url", "doc_id", "cluster_id", "is_winner")

    # the CLUSTERS delta: new docs + old docs whose assignment or winner
    # flag changed (a new doc can bridge two old clusters or unseat an old
    # winner). Everything else is already correct in prior snapshots.
    if old_assign is None:
        delta_clusters = clusters
    else:
        old_cmp = old_assign.select(
            "doc_id",
            F.col("cluster_id").alias("_old_cid"),
            F.col("is_winner").alias("_old_win"),
        )
        delta_clusters = (
            clusters.join(old_cmp, "doc_id", "left")
            .where(
                F.col("_old_cid").isNull()
                | (F.col("_old_cid") != F.col("cluster_id"))
                | (F.col("_old_win") != F.col("is_winner"))
            )
            .drop("_old_cid", "_old_win")
        )
    batch_seq = len(catalog.snapshots(CLUSTERS_STAGE))
    delta_clusters = delta_clusters.withColumn("batch_seq", F.lit(batch_seq))

    # write order = crash-safety order (module docstring): FEATURES first
    # (harmless extras if the batch dies here), CLUSTERS next, DOCS last as
    # the commit marker that flips the batch to "processed"
    fmt = {"format": FORMAT_VERSION}
    catalog.write_stage(new_feats, FEATURES_STAGE, metrics=fmt)
    catalog.write_stage(
        delta_clusters,
        CLUSTERS_STAGE,
        metrics=fmt | {"bootstrap": bootstrap, "batch_seq": batch_seq},
    )
    catalog.write_stage(
        truly_new, DOCS_STAGE, metrics=fmt | {"new_docs": truly_new.count()}
    )
    scope.release()
    if auto_compact is not None:
        active = catalog.active_snapshots(CLUSTERS_STAGE)
        if len(active) > auto_compact:
            base = active[0] if active[0].get("replaces_prior") else None
            delta_rows = sum(
                e["rows"] for e in active if not e.get("replaces_prior")
            )
            if base is None or delta_rows >= compact_tier_fraction * base["rows"]:
                compact_snapshots(catalog)
            else:
                compact_deltas(catalog)
    return read_clusters(catalog)


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
