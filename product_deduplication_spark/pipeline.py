"""End-to-end near-duplicate pipeline (SURVEY.md §7.1 architecture).

ingest(url, warc_ts, html, text, lang)
  → s1 normalize: extract_text(html) invariance check, doc_id = xxhash64(url)
  → s2 exact:     sha2(text) star edges
  → s3/s4 features: shingles + MinHash + SimHash (one Arrow UDF pass)
  → s4a LSH band candidates   → s5 verify (exact Jaccard)
  → s4b SimHash candidates    ↗
  → s6 cluster: large-star/small-star CC
  → s8 winner per cluster (longest text, earliest warc_ts tiebreak — webtext
       analog of winner selection, reference/winner_selection.py:108-109)

Mirrors the reference entry point ``groups_creation.main``
(``reference/groups_creation.py:249-304``) with the substitutions documented
in SURVEY.md §2. All stages are lazy DataFrames; `run_dedup` triggers them
and returns the handle dict so callers can persist any stage as a snapshot.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window, functions as F

from product_deduplication_spark.caching import CacheScope
from product_deduplication_spark.config import DedupConfig
from product_deduplication_spark.functions.features import make_extract_text_udf, with_features
from product_deduplication_spark.operators.connected_components import (
    assign_clusters_contracted,
)
from product_deduplication_spark.operators.exact_dedup import exact_duplicate_edges
from product_deduplication_spark.operators.lsh import candidate_pairs
from product_deduplication_spark.operators.simhash_join import simhash_candidate_pairs
from product_deduplication_spark.operators.verify import verify_pairs


@dataclass
class DedupResult:
    docs: DataFrame        # url, warc_ts, lang, text, doc_id
    features: DataFrame    # doc_id, shingles, minhash, simhash
    exact_edges: DataFrame # src, dst, method, similarity
    near_edges: DataFrame  # verified near-dup edges
    all_edges: DataFrame
    clusters: DataFrame    # url, doc_id, cluster_id, is_winner
    # every cache the pipeline created (features + operator-internal
    # persists); callers release after materializing whichever outputs they
    # need — required when running the pipeline repeatedly in one session
    caches: CacheScope = field(default_factory=CacheScope)

    def release(self) -> None:
        """Unpersist every cache this run created (features, LSH bucket
        members, CC contraction mapping). Re-reading a DedupResult DataFrame
        afterwards recomputes it from source."""
        self.caches.release()


def prepare_docs(df: DataFrame, cfg: DedupConfig, validate_extraction: bool = False) -> DataFrame:
    """Stage s1: doc ids + optional byte-identical extraction check.

    ``doc_id = xxhash64(url)`` gives long node ids for all downstream joins
    (cf. integer encoding rationale, reference/static.py:267-271).
    """
    out = df.withColumn("doc_id", F.xxhash64("url"))
    if validate_extraction and "html" in df.columns:
        extract = make_extract_text_udf()
        out = out.withColumn("_extracted", extract(F.col("html")))
        # invariant (input_hint): extracted text byte-identical to text column
        out = out.withColumn(
            "extraction_ok", F.col("_extracted") == F.col("text")
        ).drop("_extracted")
    return out


def pick_winners(clusters: DataFrame) -> DataFrame:
    """Winner per cluster: longest text, then earliest warc_ts, then min url.

    Webtext analog of reference winner selection (W2 group argmax,
    ``reference/winner_selection.py:108-109``).

    Ordering uses a precomputed ``_text_len`` column when the caller provides
    one (run_dedup tags it on the doc relation BEFORE the cluster-label
    join): ``length(text)`` referenced only above that join forces the full
    ``text`` payload through the join exchange even for consumers that never
    select it, whereas a length computed below the join lets column pruning
    drop ``text`` (and ``html``) from the shuffle entirely (guide §2.3 —
    shuffle metadata, not payloads). Identical ordering either way."""
    length_col = "_text_len" if "_text_len" in clusters.columns else None
    order = [F.desc(F.col(length_col) if length_col else F.length("text"))]
    if "warc_ts" in clusters.columns:
        order.append(F.asc("warc_ts"))
    order.append(F.asc("url"))
    w = Window.partitionBy("cluster_id").orderBy(*order)
    return clusters.withColumn("is_winner", F.row_number().over(w) == 1)


def clusters_to_groups(clusters: DataFrame) -> DataFrame:
    """Reshape cluster assignments into the reference's groups-table shape
    (group_id, leader, member, item_uuid, item_name) —
    ``reference/groups_creation.py:292-294`` — so the canonical upsert
    (operators/canonical.py) consumes webtext clusters unchanged."""
    w = Window.partitionBy("cluster_id").orderBy(F.desc("is_winner"), F.asc("url"))
    return clusters.select(
        F.col("cluster_id").alias("group_id"),
        F.first("url").over(w).alias("leader"),
        F.col("url").alias("member"),
        F.col("url").alias("item_uuid"),
        F.col("url").alias("item_name"),
    )


def run_full(
    df: DataFrame,
    catalog,
    cfg: DedupConfig | None = None,
    use_simhash: bool = False,
):
    """Dedup + persistent canonical lifecycle in one call: run the pipeline,
    then bootstrap or upsert the canonical tables through the snapshot
    catalog (the reference's first-run/incremental branch,
    ``reference/clean_canonical.py:296-338``). Returns (DedupResult,
    canonical_catalog, canonical_links)."""
    from product_deduplication_spark.operators.canonical import (
        bootstrap_canonical,
        upsert_canonical,
    )

    cfg = cfg or DedupConfig()
    res = run_dedup(df, cfg, use_simhash=use_simhash)
    groups = clusters_to_groups(res.clusters)
    if catalog.has_stage("canonical_catalog"):
        cat_df = catalog.read_stage("canonical_catalog")
        links_df = catalog.read_stage("canonical_links")
        cat_df, links_df = upsert_canonical(cat_df, links_df, groups)
    else:
        cat_df, links_df = bootstrap_canonical(groups)
    catalog.write_stage(cat_df, "canonical_catalog")
    catalog.write_stage(links_df, "canonical_links")
    return res, catalog.read_stage("canonical_catalog"), catalog.read_stage("canonical_links")


def run_dedup(
    df: DataFrame,
    cfg: DedupConfig | None = None,
    use_simhash: bool = False,
    validate_extraction: bool = False,
) -> DedupResult:
    cfg = cfg or DedupConfig()
    scope = CacheScope()
    docs = prepare_docs(df, cfg, validate_extraction=validate_extraction)
    eligible = docs.where(F.length("text") >= cfg.min_doc_chars)

    feats = with_features(
        eligible.select("doc_id", "text"), cfg, simhash=use_simhash
    ).select("doc_id", "shingles", "minhash", "simhash", "bands")
    # features feed 2-3 downstream consumers — cache once (at cluster scale
    # this stage is persisted as a snapshot table instead, see catalog.py)
    feats = scope.persist(feats)

    exact = exact_duplicate_edges(eligible, "doc_id", "text")

    lsh_pairs = candidate_pairs(feats, cfg, scope=scope)
    pairs = lsh_pairs
    if use_simhash:
        pairs = pairs.unionByName(simhash_candidate_pairs(feats, cfg)).dropDuplicates(
            ["src", "dst"]
        )
    near = verify_pairs(pairs, feats, cfg)

    all_edges = exact.unionByName(near).dropDuplicates(["src", "dst"])
    # exact-dup classes are star components already — contract them to their
    # min-id hubs so the iterative CC runs on the near-dup graph only (label
    # equality with the uncontracted CC is pinned in tests; at web scale the
    # exact stars dominate the edge list)
    # winner ordering key computed BELOW the label join (see pick_winners:
    # lets count-only consumers prune text/html out of the join exchange)
    clustered = assign_clusters_contracted(
        docs.withColumn("_text_len", F.length("text")),
        exact.select("src", "dst"), near.select("src", "dst"), "doc_id",
        scope=scope,
    )
    clustered = pick_winners(clustered).drop("_text_len")
    return DedupResult(
        docs=docs,
        features=feats,
        exact_edges=exact,
        near_edges=near,
        all_edges=all_edges,
        clusters=clustered,
        caches=scope,
    )
