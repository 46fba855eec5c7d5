"""Incremental dedup == full recompute on the union (the invariant that
makes snapshot-incremental processing trustworthy)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from product_deduplication_spark.catalog import SnapshotCatalog
from product_deduplication_spark.config import DedupConfig
from product_deduplication_spark.datagen import generate_web_documents
from product_deduplication_spark.oracle.brute_force import clusters_to_pairs
from product_deduplication_spark.pipeline import run_dedup
from product_deduplication_spark.streaming.incremental import incremental_dedup

CFG = DedupConfig(shuffle_partitions=8)


@pytest.fixture(scope="module")
def corpus():
    docs, _ = generate_web_documents(n_base_docs=120, seed=21)
    half = len(docs) // 2
    return docs.iloc[:half], docs.iloc[half:], docs


def _partition_pairs(rows):
    labels = {r["url"]: r["cluster_id"] for r in rows}
    return clusters_to_pairs(labels)


def test_incremental_equals_full_recompute(spark, tmp_path, corpus):
    batch1, batch2, full = corpus
    cat = SnapshotCatalog(spark, str(tmp_path / "inc"))
    c1 = incremental_dedup(spark, cat, spark.createDataFrame(batch1[["url", "text"]]), CFG)
    assert c1.count() == len(batch1)
    c2 = incremental_dedup(spark, cat, spark.createDataFrame(batch2[["url", "text"]]), CFG)
    assert c2.count() == len(full)
    full_res = run_dedup(spark.createDataFrame(full[["url", "text"]]), CFG)
    inc_pairs = _partition_pairs(c2.collect())
    full_pairs = _partition_pairs(full_res.clusters.select("url", "cluster_id").collect())
    assert inc_pairs == full_pairs


def test_incremental_idempotent_on_resubmission(spark, tmp_path, corpus):
    batch1, _, _ = corpus
    cat = SnapshotCatalog(spark, str(tmp_path / "inc2"))
    c1 = incremental_dedup(spark, cat, spark.createDataFrame(batch1[["url", "text"]]), CFG)
    n1 = c1.count()
    p1 = _partition_pairs(c1.collect())
    # resubmit the SAME batch: no growth, same partitions
    c2 = incremental_dedup(spark, cat, spark.createDataFrame(batch1[["url", "text"]]), CFG)
    assert c2.count() == n1
    assert _partition_pairs(c2.collect()) == p1


def test_three_batches_cross_batch_near_dup(spark, tmp_path):
    """A batch-3 doc that near-duplicates a batch-1 doc must land in its
    cluster — regression for the FEATURES_STAGE latest-snapshot-only bug
    (old features must be the union of ALL prior batch deltas)."""
    import random

    rng = random.Random(13)
    vocab = [f"tok{k}" for k in range(4000)]

    def doc(n=300):
        return " ".join(rng.choice(vocab) for _ in range(n))

    base = doc()
    near = " ".join(base.split()[3:])  # drop 3 tokens: Jaccard >> 0.8
    b1 = [("https://x/base", base)] + [(f"https://x/a{i}", doc()) for i in range(5)]
    b2 = [(f"https://x/b{i}", doc()) for i in range(6)]
    b3 = [("https://x/near", near)] + [(f"https://x/c{i}", doc()) for i in range(5)]

    cat = SnapshotCatalog(spark, str(tmp_path / "inc3"))
    for batch in (b1, b2, b3):
        res = incremental_dedup(
            spark, cat, spark.createDataFrame(batch, "url string, text string"), CFG
        )
    rows = {r["url"]: r["cluster_id"] for r in res.collect()}
    assert rows["https://x/base"] == rows["https://x/near"]
    # and the invariant: incremental == full recompute on the union
    full = run_dedup(
        spark.createDataFrame(b1 + b2 + b3, "url string, text string"), CFG
    )
    inc_pairs = clusters_to_pairs(rows)
    full_pairs = clusters_to_pairs(
        {r["url"]: r["cluster_id"] for r in full.clusters.select("url", "cluster_id").collect()}
    )
    assert inc_pairs == full_pairs


def test_clusters_snapshot_is_delta_sized(spark, tmp_path):
    """A batch's CLUSTERS snapshot must hold ~delta-many rows (new docs +
    bridged/unseated old docs), never the full corpus — at 10^12 docs a
    full rewrite per batch is an O(corpus) write (round-2 defect)."""
    docs, _ = generate_web_documents(n_base_docs=80, seed=31)
    third = len(docs) // 3
    cat = SnapshotCatalog(spark, str(tmp_path / "inc_delta"))
    b1, b2 = docs.iloc[:third], docs.iloc[third:]
    incremental_dedup(spark, cat, spark.createDataFrame(b1[["url", "text"]]), CFG)
    res = incremental_dedup(spark, cat, spark.createDataFrame(b2[["url", "text"]]), CFG)
    snaps = cat.snapshots("inc_clusters")
    assert len(snaps) == 2
    assert snaps[0]["rows"] == len(b1)
    # batch-2 delta: its own docs plus any batch-1 docs it bridged/unseated —
    # strictly less than the full corpus it would be under rewrite semantics
    assert len(b2) <= snaps[1]["rows"] < len(docs)
    assert res.count() == len(docs)


def test_crash_between_clusters_and_docs_write_recovers(spark, tmp_path, corpus):
    """ADVICE round-2 (medium): a batch that dies after writing its
    features/clusters deltas but BEFORE the DOCS commit marker must be
    fully reprocessed on resubmission — docs from the crashed attempt must
    not become permanent singletons."""
    from product_deduplication_spark.streaming import incremental as inc

    batch1, batch2, full = corpus
    root = str(tmp_path / "inc_crash")
    cat = SnapshotCatalog(spark, root)
    incremental_dedup(spark, cat, spark.createDataFrame(batch1[["url", "text"]]), CFG)

    class CrashingCatalog(SnapshotCatalog):
        def write_stage(self, df, stage, metrics=None):
            if stage == inc.DOCS_STAGE:
                raise RuntimeError("simulated crash before commit marker")
            return super().write_stage(df, stage, metrics)

    crash_cat = CrashingCatalog(spark, root)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        incremental_dedup(
            spark, crash_cat, spark.createDataFrame(batch2[["url", "text"]]), CFG
        )
    # retry on a healthy catalog: the batch is still "new" (no DOCS row) and
    # reprocesses in full; half-written features/clusters rows are superseded
    c2 = incremental_dedup(
        spark, cat, spark.createDataFrame(batch2[["url", "text"]]), CFG
    )
    assert c2.count() == len(full)
    full_res = run_dedup(spark.createDataFrame(full[["url", "text"]]), CFG)
    assert _partition_pairs(c2.collect()) == _partition_pairs(
        full_res.clusters.select("url", "cluster_id").collect()
    )


def test_old_format_catalog_is_refused(spark, tmp_path):
    """Catalogs written by pre-format-2 code (no bands column, full-rewrite
    clusters) must fail loudly with a migration message, not corrupt state."""
    import pytest as _pytest

    cat = SnapshotCatalog(spark, str(tmp_path / "inc_old"))
    old = spark.createDataFrame([("u://1", 1, "t")], "url string, doc_id long, text string")
    cat.write_stage(old, "inc_docs")  # no format stamp = legacy
    cat.write_stage(
        spark.createDataFrame([(1, 1, True, 0)], "doc_id long, cluster_id long, is_winner boolean, batch_seq int"),
        "inc_clusters",
    )
    with _pytest.raises(RuntimeError, match="format"):
        incremental_dedup(
            spark, cat, spark.createDataFrame([("u://2", "x")], "url string, text string"), CFG
        )


def test_compaction_preserves_state_and_bounds_reads(spark, tmp_path):
    """compact_snapshots must leave read_clusters/read_stage_union output
    identical, shrink every stage's ACTIVE snapshot list to one, keep the
    full manifest history time-travelable, and leave subsequent incremental
    batches equal to a full recompute."""
    from product_deduplication_spark.streaming import incremental as inc

    docs, _ = generate_web_documents(n_base_docs=90, seed=77)
    third = len(docs) // 3
    batches = [docs.iloc[:third], docs.iloc[third : 2 * third], docs.iloc[2 * third :]]
    cat = SnapshotCatalog(spark, str(tmp_path / "inc_compact"))
    for b in batches[:2]:
        incremental_dedup(
            spark, cat, spark.createDataFrame(b[["url", "text"]]), CFG, auto_compact=None
        )
    pre = _partition_pairs(inc.read_clusters(cat).collect())
    pre_docs = {r["doc_id"] for r in cat.read_stage_union(inc.DOCS_STAGE).collect()}
    n_hist = len(cat.snapshots(inc.CLUSTERS_STAGE))
    assert len(cat.active_snapshots(inc.CLUSTERS_STAGE)) == 2

    inc.compact_snapshots(cat)
    for stage in (inc.DOCS_STAGE, inc.FEATURES_STAGE, inc.CLUSTERS_STAGE):
        assert len(cat.active_snapshots(stage)) == 1, stage
    # full history retained for time travel
    assert len(cat.snapshots(inc.CLUSTERS_STAGE)) == n_hist + 1
    assert _partition_pairs(inc.read_clusters(cat).collect()) == pre
    assert {r["doc_id"] for r in cat.read_stage_union(inc.DOCS_STAGE).collect()} == pre_docs

    # post-compaction batch still equals a full recompute of the union
    res = incremental_dedup(
        spark, cat, spark.createDataFrame(batches[2][["url", "text"]]), CFG,
        auto_compact=None,
    )
    assert res.count() == len(docs)
    full_res = run_dedup(spark.createDataFrame(docs[["url", "text"]]), CFG)
    assert _partition_pairs(res.collect()) == _partition_pairs(
        full_res.clusters.select("url", "cluster_id").collect()
    )


def test_size_tiered_compaction_minor_merges_deltas_only(spark, tmp_path):
    """VERDICT r04 #6: once a base exists and the accumulated deltas are
    small relative to it, compaction must merge ONLY the deltas
    (replaces_ids, I/O proportional to delta volume) instead of rewriting
    the full state — while read_clusters stays equal to a full recompute."""
    from product_deduplication_spark.streaming import incremental as inc

    docs, _ = generate_web_documents(n_base_docs=80, seed=47)
    base_n = int(len(docs) * 0.7)
    cat = SnapshotCatalog(spark, str(tmp_path / "inc_tier"))
    # bootstrap (large) + one more batch -> width 2 -> first compaction has
    # no base yet, so it must be FULL (establishes the base)
    incremental_dedup(spark, cat, spark.createDataFrame(docs.iloc[:base_n][["url", "text"]]), CFG)
    rest = docs.iloc[base_n:]
    step = max(1, len(rest) // 5)
    batches = [rest.iloc[i * step : (i + 1) * step] for i in range(5)]
    batches = [b for b in batches if len(b)]
    incremental_dedup(spark, cat, spark.createDataFrame(batches[0][["url", "text"]]), CFG, auto_compact=1)
    snaps = cat.snapshots(inc.CLUSTERS_STAGE)
    assert snaps[-1]["replaces_prior"] and not snaps[-1]["replaces_ids"]
    base_rows = snaps[-1]["rows"]

    # two more small batches -> width 3 > 2 -> deltas are tiny vs base ->
    # MINOR compaction: replaces_ids set, base untouched, rows ~ delta-sized
    for b in batches[1:3]:
        incremental_dedup(spark, cat, spark.createDataFrame(b[["url", "text"]]), CFG, auto_compact=2)
    snaps = cat.snapshots(inc.CLUSTERS_STAGE)
    minor = snaps[-1]
    assert not minor["replaces_prior"] and len(minor["replaces_ids"]) >= 2
    assert minor["rows"] < base_rows, "minor compaction rewrote ~full state"
    active = cat.active_snapshots(inc.CLUSTERS_STAGE)
    assert len(active) == 2  # base + merged delta
    assert active[0]["replaces_prior"] and active[1] == minor
    # every stage's minor entry is delta-proportional
    for stage in (inc.DOCS_STAGE, inc.FEATURES_STAGE):
        s = cat.snapshots(stage)[-1]
        assert s["replaces_ids"] and s["rows"] < base_rows

    # state equality after more batches: incremental == full recompute
    res = incremental_dedup(
        spark, cat, spark.createDataFrame(batches[3][["url", "text"]]), CFG, auto_compact=None
    )
    seen = pd.concat([docs.iloc[:base_n]] + batches[:4])
    full_res = run_dedup(spark.createDataFrame(seen[["url", "text"]]), CFG)
    assert _partition_pairs(res.collect()) == _partition_pairs(
        full_res.clusters.select("url", "cluster_id").collect()
    )


def test_compaction_concurrent_writer_guard(spark, tmp_path):
    """ADVICE r04: a delta batch committing between a compaction's read and
    its manifest append must abort the compaction (ConcurrentSnapshotError),
    never be silently truncated out of the active set."""
    from product_deduplication_spark.catalog import ConcurrentSnapshotError
    from product_deduplication_spark.streaming import incremental as inc

    docs, _ = generate_web_documents(n_base_docs=40, seed=61)
    half = len(docs) // 2
    cat = SnapshotCatalog(spark, str(tmp_path / "inc_guard"))
    incremental_dedup(spark, cat, spark.createDataFrame(docs.iloc[:half][["url", "text"]]), CFG)
    # "compaction" reads state here...
    stale = inc._expected_latest(cat, inc.CLUSTERS_STAGE)
    state = inc.read_clusters(cat).withColumn("batch_seq", F.lit(99))
    # ...but another batch commits in between
    incremental_dedup(spark, cat, spark.createDataFrame(docs.iloc[half:][["url", "text"]]), CFG)
    interloper = cat.snapshots(inc.CLUSTERS_STAGE)[-1]["snapshot_id"]
    with pytest.raises(ConcurrentSnapshotError):
        cat.write_stage(
            state, inc.CLUSTERS_STAGE, replaces_prior=True, expected_latest_id=stale
        )
    # the interloper's delta is still active and state is intact
    active_ids = {e["snapshot_id"] for e in cat.active_snapshots(inc.CLUSTERS_STAGE)}
    assert interloper in active_ids
    assert inc.read_clusters(cat).count() == len(docs)


def test_auto_compaction_triggers_on_snapshot_count(spark, tmp_path):
    docs, _ = generate_web_documents(n_base_docs=40, seed=55)
    cat = SnapshotCatalog(spark, str(tmp_path / "inc_auto"))
    from product_deduplication_spark.streaming import incremental as inc

    quarter = max(1, len(docs) // 4)
    for i in range(4):
        b = docs.iloc[i * quarter : (i + 1) * quarter]
        if len(b) == 0:
            break
        incremental_dedup(
            spark, cat, spark.createDataFrame(b[["url", "text"]]), CFG, auto_compact=2
        )
    # after exceeding the threshold, active lists were truncated
    assert len(cat.active_snapshots(inc.CLUSTERS_STAGE)) <= 3
    assert any(e.get("replaces_prior") for e in cat.snapshots(inc.CLUSTERS_STAGE))
