"""Engine configuration.

One frozen dataclass carries every tuning knob of the dedup pipeline so a run
is fully reproducible from (input snapshot, config, code version). Defaults
are chosen for the recall >= 0.99 gate (BASELINE.json "metric"): with
``num_hashes=126``, ``lsh_bands=21`` (rows_per_band=6) the S-curve candidate
probability at Jaccard s is 1-(1-s^6)^21: 0.9983 at s=0.80, 0.99994 at
s=0.85, ~1 at s>=0.9 — while background pairs (corpus median s~0.1) collide
with probability ~2e-5, keeping the candidate set linear in true duplicates
rather than quadratic in corpus size. With an *exact* Jaccard verify stage
downstream, pipeline recall at threshold 0.8 is >= 0.998 and precision is
exactly 1.0. (The earlier r=4 setting made EVERY s>=0.6 pair a candidate but
admitted 0.3% of the n^2 background — measured 40x more candidates and a 10x
slower verify stage at 18k docs.)

The reference's analogous knobs: candidate cap ntop=25 / lower_bound=0
(``reference/static.py:194``), fuzzy thresholds 95/90
(``reference/groups_creation.py:37-39``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling -------------------------------------------------------
    shingle_mode: str = "char"  # "char" (k-byte shingles) | "token" (word n-grams)
    shingle_k: int = 5          # k for char mode, n for token mode

    # --- MinHash / LSH ---------------------------------------------------
    num_hashes: int = 126       # MinHash signature length
    lsh_bands: int = 21         # bands; rows_per_band = num_hashes // lsh_bands
    # "oph" = one-permutation hashing w/ rotation densification (one pass
    # over the shingles — compute-bound, scales with cores); "kwise" =
    # classic per-permutation multiply-shift (num_hashes passes — DRAM-bound
    # under many-executor concurrency). Same estimator quality (rmse ~0.025
    # at 126 bins, property-tested); signatures are NOT interchangeable
    # between modes.
    minhash_mode: str = "oph"
    jaccard_threshold: float = 0.8  # exact-Jaccard verify threshold
    # minhash-estimate prefilter margin: candidates with estimated Jaccard
    # below (threshold - margin) skip the expensive exact verify join.
    # With 126 hashes, se at s=0.8 is ~0.036 → a 0.25 margin is ~7 sigma:
    # P(drop a true pair) < 1e-11. Set to None to disable.
    prefilter_margin: float | None = 0.25

    # --- SimHash ---------------------------------------------------------
    simhash_bits: int = 64
    simhash_chunks: int = 4     # pigeonhole chunks -> detects hamming <= chunks-1
    simhash_hamming_max: int = 3

    # --- skew / scale controls (SURVEY.md §4.1) -------------------------
    # Buckets with <= bucket_cap members enumerate all pairs; larger buckets
    # (boilerplate pages whose band hash collides for millions of docs) are
    # star-connected through their min doc_id instead of exploding O(n^2).
    bucket_cap: int = 64
    # Optional per-doc candidate cap for reference parity (ntop=25,
    # reference/static.py:194). None = unbounded (LSH bounds structurally).
    candidate_cap_per_doc: int | None = None
    shuffle_partitions: int = 32

    # --- misc ------------------------------------------------------------
    seed: int = 42
    min_doc_chars: int = 1      # docs shorter than this skip near-dup stages
    substring_min_len: int = 50 # min length for exact-substring dedup match

    def __post_init__(self) -> None:
        # fail at construction, not deep inside a pipeline stage: every LSH
        # consumer derives rows_per_band, and an indivisible banding would
        # otherwise surface as a confusing mid-job error
        if self.num_hashes <= 0 or self.lsh_bands <= 0:
            raise ValueError("num_hashes and lsh_bands must be positive")
        if self.num_hashes % self.lsh_bands != 0:
            raise ValueError(
                f"num_hashes ({self.num_hashes}) must be divisible by "
                f"lsh_bands ({self.lsh_bands})"
            )
        if not (0.0 < self.jaccard_threshold <= 1.0):
            raise ValueError("jaccard_threshold must be in (0, 1]")

    @property
    def rows_per_band(self) -> int:
        return self.num_hashes // self.lsh_bands

    def with_(self, **kw) -> "DedupConfig":
        return replace(self, **kw)

    def candidate_probability(self, s: float) -> float:
        """P(pair with true Jaccard s becomes an LSH candidate)."""
        r = self.rows_per_band
        return 1.0 - (1.0 - s**r) ** self.lsh_bands


# The grocery-parity LSH config (char-3 shingles, 42x3 banding) lives in
# parity.PARITY_CONFIG next to the pipeline that uses it; the reference's
# top-25 candidate cap (reference/static.py:194) is `candidate_cap_per_doc`.
