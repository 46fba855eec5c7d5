from __future__ import annotations

from product_deduplication_spark.catalog import SnapshotCatalog
from product_deduplication_spark.config import DedupConfig
from product_deduplication_spark.datagen import generate_web_documents
from product_deduplication_spark.pipeline import run_full

CFG = DedupConfig(shuffle_partitions=8)


def test_run_full_bootstrap_then_upsert(spark, tmp_path):
    docs, _ = generate_web_documents(n_base_docs=60, seed=13)
    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))
    sdf = spark.createDataFrame(docs[["url", "text"]])
    res, catalog_df, links = run_full(sdf, cat, CFG)
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    assert catalog_df.count() == n_clusters
    assert links.count() == len(docs)
    # every link's leader exists in the catalog
    missing = links.join(catalog_df, "canonical_id", "left_anti")
    assert missing.count() == 0
    # second run over the same corpus: direct matches, no id growth
    _, catalog2, links2 = run_full(sdf, cat, CFG)
    assert catalog2.count() == n_clusters
    assert links2.count() == len(docs)
