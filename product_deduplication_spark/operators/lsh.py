"""MinHash-LSH banding: candidate-pair generation with explicit skew control.

This is the central architectural substitution (SURVEY.md §2.3 J8): the
reference's candidate generator is a global TF-IDF matrix times its transpose
with a C++ top-k kernel (``reference/static.py:58-85,194``). At 10^12 docs a
global matrix is impossible; LSH banding makes candidate generation a
*relational* operation — explode signatures to (band, band_hash) keys and
group — which Catalyst/AQE can plan, and whose skew we control explicitly
(north_rule).

Skew strategy (SURVEY.md §4.1):
  1. Bucket sizes are computed FIRST (count agg — map-side partial, no
     collect_list on the hot key).
  2. Buckets with <= bucket_cap members enumerate all intra-bucket pairs via
     JVM higher-order functions (transform+slice over the sorted member
     array) — no Python, no per-row UDF.
  3. HOT buckets (boilerplate pages: one band hash shared by millions) are
     star-connected through their min-id member: O(n) edges instead of
     O(n^2), same connectivity after verification for true duplicates, and
     the groupBy producing the hub is a plain min() agg that partial-
     aggregates map-side — the hot key never concentrates rows on one
     reducer.
  4. ``salt`` repartitioning before the bucket agg spreads a hot band-hash
     across ``shuffle_partitions`` map tasks (AQE skew-join handles the rest).

Band hashes are computed JVM-side with xxhash64 over signature slices —
whole-stage codegen, no Python round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from product_deduplication_spark.config import DedupConfig


def band_hash_array(cfg: DedupConfig, sig_col: str = "minhash"):
    """array<long> of per-band hashes: band i = xxhash64(i, slice of rows)."""
    r = cfg.rows_per_band
    return F.array(
        *[
            F.xxhash64(F.lit(i), F.slice(F.col(sig_col), i * r + 1, r))
            for i in range(cfg.lsh_bands)
        ]
    )


def explode_bands(features: DataFrame, cfg: DedupConfig, id_col: str = "doc_id") -> DataFrame:
    """(band, band_hash, node) — one row per (doc, band)."""
    return features.select(
        F.col(id_col).alias("node"),
        F.posexplode(band_hash_array(cfg)).alias("band", "band_hash"),
    )


def candidate_pairs(features: DataFrame, cfg: DedupConfig, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs (src < dst) from LSH band collisions.

    Returns (src, dst). Verification (exact Jaccard) happens downstream —
    precision here is irrelevant, only recall matters.
    """
    bands = explode_bands(features, cfg, id_col)

    # Skew note: no explicit pre-shuffle salting is needed for these aggs —
    # count/min are algebraic, so Spark partial-aggregates them map-side and
    # a hot (band, band_hash) key reaches the reducer as one row per map
    # task, never as raw rows. (An earlier version repartitioned by
    # (band, band_hash, node) first — a full extra shuffle that groupBy
    # immediately re-shuffled away.)
    sizes = bands.groupBy("band", "band_hash").agg(
        F.count("*").alias("bucket_n"), F.min("node").alias("hub")
    )
    keyed = bands.join(sizes.where(F.col("bucket_n") > 1), ["band", "band_hash"])

    small = keyed.where(F.col("bucket_n") <= cfg.bucket_cap)
    big = keyed.where(F.col("bucket_n") > cfg.bucket_cap)

    # small buckets: full pair enumeration via sorted member array + HOFs
    small_buckets = small.groupBy("band", "band_hash").agg(
        F.array_sort(F.collect_list("node")).alias("ids")
    )
    ids = F.col("ids")
    pair_struct = F.transform(
        ids,
        lambda x, i: F.transform(
            F.slice(ids, i + 2, F.size(ids)),
            lambda y: F.struct(x.alias("src"), y.alias("dst")),
        ),
    )
    small_pairs = (
        small_buckets.select(F.explode(F.flatten(pair_struct)).alias("p"))
        .select(F.col("p.src"), F.col("p.dst"))
    )

    # hot buckets: star through the min-id hub (skew-safe, O(n) edges)
    big_pairs = big.where(F.col("node") != F.col("hub")).select(
        F.col("hub").alias("src"), F.col("node").alias("dst")
    )

    return small_pairs.unionByName(big_pairs).dropDuplicates(["src", "dst"])
