"""Cache lifecycle: operator-internal persists must be releasable and the
incremental loop must not leak CacheManager entries across batches.

Dataset.persist registers the plan in the CacheManager, which holds a strong
reference until unpersist() — the ContextCleaner never reclaims it. A
streaming job calls incremental_dedup once per micro-batch in one long-lived
session, so any operator-internal persist without an explicit release
accumulates cached partitions for the life of the job (r04 ADVICE).
"""

from __future__ import annotations

from product_deduplication_spark.catalog import SnapshotCatalog
from product_deduplication_spark.config import DedupConfig
from product_deduplication_spark.datagen import generate_web_documents
from product_deduplication_spark.pipeline import run_dedup
from product_deduplication_spark.streaming.incremental import incremental_dedup

CFG = DedupConfig(shuffle_partitions=8)


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_run_dedup_release_empties_cache_manager(spark):
    cm = _cache_manager(spark)
    cm.clearCache()  # isolate from caches other tests left in the session
    docs, _ = generate_web_documents(n_base_docs=60, seed=92)
    res = run_dedup(spark.createDataFrame(docs[["url", "text"]]), CFG)
    res.clusters.count()
    # the pipeline run pinned features + LSH bucket members + CC mapping
    assert not cm.isEmpty()
    res.release()
    assert cm.isEmpty()


def test_ten_incremental_batches_leak_no_caches(spark, tmp_path):
    """>= 10 batches in one session: the CacheManager must return to empty
    after every batch (candidate_pairs' keyed/big2 and the features cache
    are scope-released before incremental_dedup returns)."""
    cm = _cache_manager(spark)
    cm.clearCache()
    docs, _ = generate_web_documents(n_base_docs=80, seed=91)
    cat = SnapshotCatalog(spark, str(tmp_path / "inc_cache"))
    step = max(1, len(docs) // 10)
    batches_run = 0
    for i in range(10):
        b = docs.iloc[i * step : (i + 1) * step]
        if len(b) == 0:
            break
        incremental_dedup(
            spark, cat, spark.createDataFrame(b[["url", "text"]]), CFG
        )
        assert cm.isEmpty(), f"leaked Dataset caches after batch {i}"
        batches_run += 1
    assert batches_run >= 10
