"""Pair verification: exact Jaccard over shingle sets, JVM-side.

Replaces the reference's per-row ``fuzz.token_sort_ratio`` apply
(``reference/static.py:203-215``, SURVEY.md V4) — instead of a Python loop we
join candidate pairs back to per-doc shingle arrays and compute
``size(array_intersect)/size(array_union)`` inside whole-stage codegen.
Precision after this stage is exactly 1.0 w.r.t. the Jaccard threshold, so
end-to-end recall is determined solely by candidate generation (LSH S-curve).

Scale: two shuffles (sort-merge joins pairs↔features on long keys). The
features projection carries only (doc_id, shingles) — column pruning keeps
text/html out of the shuffle. Optional per-doc candidate cap reproduces the
reference's ntop=25 (``reference/static.py:194``) via a rank window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from product_deduplication_spark.config import DedupConfig


def _sig32(col):
    """Signature narrowed to 32-bit ints for the ESTIMATE joins — halves the
    per-candidate signature bytes crossing the prefilter exchanges. Output-
    neutral by a superset argument: truncated equality is a SUPERSET of full
    equality, so the estimate can only increase and the filter only becomes
    more permissive — no pair that previously reached the exact-Jaccard
    check is dropped, and every extra survivor (P ~ 2^-31 per element) still
    faces the exact check, which alone decides the output."""
    return F.transform(
        col, lambda x: x.bitwiseAND(F.lit(0x7FFFFFFF)).cast("int")
    )


def minhash_estimate_prefilter(
    pairs: DataFrame, features: DataFrame, cfg: DedupConfig, id_col: str = "doc_id"
) -> DataFrame:
    """Drop candidates whose MinHash-estimated Jaccard is far below the
    threshold BEFORE shipping full shingle arrays into the verify join.

    Signatures are ~10x smaller than shingle sets (126 longs vs ~1.2k for a
    web page), so this turns the verify join from O(candidates x set_size)
    into O(candidates x sig_len) + O(survivors x set_size). The margin makes
    the drop probability for a true >= threshold pair < 1e-11 (7 sigma at
    126 hashes) — recall is preserved; exactness (precision) is untouched
    because survivors still get the exact Jaccard check.
    """
    if cfg.prefilter_margin is None:
        return pairs
    sig = features.select(
        F.col(id_col).alias("_sid"), _sig32(F.col("minhash")).alias("_sig")
    )
    a = sig.withColumnRenamed("_sid", "src").withColumnRenamed("_sig", "_sig_a")
    b = sig.withColumnRenamed("_sid", "dst").withColumnRenamed("_sig", "_sig_b")
    est = F.aggregate(
        F.zip_with("_sig_a", "_sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(cfg.num_hashes)
    cutoff = max(0.0, cfg.jaccard_threshold - cfg.prefilter_margin)
    # merge hints: the signature sides grow with the corpus — never allow
    # a (mis-estimated) broadcast of them (measured: a static broadcast of
    # an array-carrying features relation aborted the driver at 370k docs)
    return (
        pairs.join(a.hint("merge"), "src")
        .join(b.hint("merge"), "dst")
        .where(est >= F.lit(cutoff))
        .select("src", "dst")
    )


def verify_pairs(
    pairs: DataFrame,
    features: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    method: str = "minhash",
) -> DataFrame:
    """(src, dst, method, similarity) for pairs with exact Jaccard >= threshold.

    Join structure with the prefilter on: THREE feature joins, not four —
    (1) src side attaches the signature, (2) dst side attaches signature AND
    shingles in one join (the shingles ride the features-side exchange,
    whose bytes are O(corpus) and shipped either way; the estimate filter
    runs in the same stage, so no per-candidate shingle bytes cross a
    further exchange), (3) the SURVIVORS re-join the src side for shingles.
    Identical byte profile to the former separate-prefilter four-join chain
    — per-candidate intermediates still carry only signatures until the
    estimate filter — at one join / three stages less fixed latency."""
    if cfg.prefilter_margin is None:
        feat = features.select(F.col(id_col).alias("_fid"), F.col("shingles").alias("_sh"))
        a = feat.withColumnRenamed("_fid", "src").withColumnRenamed("_sh", "_sh_a")
        b = feat.withColumnRenamed("_fid", "dst").withColumnRenamed("_sh", "_sh_b")
        joined = pairs.join(a.hint("merge"), "src").join(b.hint("merge"), "dst")
    else:
        sig_a = features.select(
            F.col(id_col).alias("src"), _sig32(F.col("minhash")).alias("_sig_a")
        )
        b_side = features.select(
            F.col(id_col).alias("dst"),
            _sig32(F.col("minhash")).alias("_sig_b"),
            F.col("shingles").alias("_sh_b"),
        )
        sh_a = features.select(
            F.col(id_col).alias("src"), F.col("shingles").alias("_sh_a")
        )
        est = F.aggregate(
            F.zip_with("_sig_a", "_sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ) / F.lit(cfg.num_hashes)
        cutoff = max(0.0, cfg.jaccard_threshold - cfg.prefilter_margin)
        # merge hints: see minhash_estimate_prefilter — the feature sides
        # grow with the corpus and must never be (mis-estimate) broadcast
        joined = (
            pairs.join(sig_a.hint("merge"), "src")
            .join(b_side.hint("merge"), "dst")
            .where(est >= F.lit(cutoff))
            .select("src", "dst", "_sh_b")
            .join(sh_a.hint("merge"), "src")
        )
    # |A ∪ B| = |A| + |B| - |A ∩ B| — exact for these arrays (shingle sets
    # are distinct by construction, _to_shingle32 returns np.unique), and it
    # skips materializing a |A|+|B|-element union array per candidate pair;
    # only the intersect pass remains. Integer arithmetic, so `sim` is
    # bit-identical to the array_union form.
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size("_sh_a") + F.size("_sh_b") - inter
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    out = (
        joined.withColumn("similarity", sim)
        .where(F.col("similarity") >= F.lit(cfg.jaccard_threshold))
        .select("src", "dst", F.lit(method).alias("method"), "similarity")
    )
    if cfg.candidate_cap_per_doc is not None:
        w = Window.partitionBy("src").orderBy(F.desc("similarity"), F.asc("dst"))
        out = (
            out.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= cfg.candidate_cap_per_doc)
            .drop("_rk")
        )
    return out
