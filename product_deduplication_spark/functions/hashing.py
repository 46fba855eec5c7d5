"""Deterministic vectorized hash kernels (numpy, uint64 wraparound).

These replace the reference's scipy-CSR TF-IDF vectorization
(``reference/static.py:177-189``) and its C++ ``sparse_dot_topn`` cosine
kernel (``reference/static.py:58-85``): instead of a global sparse matrix we
compute per-document shingle-hash sets, MinHash signatures, and SimHash
fingerprints — all batched, one numpy matrix op per Arrow batch per hash
family ("Accelerating Python UDFs in Vectorized Query Execution", CIDR 2022).

Everything here is a pure function of (bytes, seed): no locale, no process
randomness — required for the byte-identical / deterministic invariants
(BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_FNV_PRIME = np.uint64(1099511628211)
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

# numpy integer overflow wraparound is intended everywhere in this module
_err = np.seterr(over="ignore")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — a strong 64-bit bijective mixer (public domain
    constant set, Steele et al.). Vectorized over a uint64 array."""
    z = x.astype(np.uint64, copy=True)
    z = (z + _GOLDEN) & _U64_MAX
    z ^= z >> np.uint64(30)
    z = (z * _MIX1) & _U64_MAX
    z ^= z >> np.uint64(27)
    z = (z * _MIX2) & _U64_MAX
    z ^= z >> np.uint64(31)
    return z


def hash_bytes(data: bytes) -> int:
    """FNV-1a-style 64-bit hash of a byte string (scalar, deterministic)."""
    h = np.uint64(0xCBF29CE484222325)
    if data:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        for b in arr:  # only used for short strings (tokens); batched paths below
            h = ((h ^ b) * _FNV_PRIME) & _U64_MAX
    return int(splitmix64(np.array([h], dtype=np.uint64))[0])


def char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct 64-bit hashes of all k-byte shingles of ``text`` (UTF-8).

    Rolling polynomial over the byte array, fully vectorized: k shifted adds
    instead of a per-shingle loop. Returns a sorted unique uint64 array
    (set semantics — Jaccard is over shingle *sets*).
    """
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = b.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n <= k:
        h = np.zeros(1, dtype=np.uint64)
        for j in range(n):
            h = (h * _FNV_PRIME + b[j]) & _U64_MAX
        return splitmix64(h)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = (h * _FNV_PRIME + b[j : j + m]) & _U64_MAX
    return np.unique(splitmix64(h))


def token_hashes(text: str) -> np.ndarray:
    """64-bit hash per whitespace token, in document order (with repeats —
    SimHash weighting uses term frequency). Vectorized: hashes the byte array
    once with token-boundary resets instead of per-token Python loops.
    """
    b = np.frombuffer((" " + text + " ").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    is_space = (b == 32) | (b == 9) | (b == 10) | (b == 13)
    starts = np.flatnonzero(is_space[:-1] & ~is_space[1:]) + 1
    ends = np.flatnonzero(~is_space[:-1] & is_space[1:]) + 1
    if starts.size == 0:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(starts.size, dtype=np.uint64)
    # vectorize across tokens of equal length bucket-by-bucket
    lengths = ends - starts
    for L in np.unique(lengths):
        idx = np.flatnonzero(lengths == L)
        # gather a (num_tokens_of_len_L, L) byte matrix
        gather = starts[idx][:, None] + np.arange(L, dtype=starts.dtype)[None, :]
        mat = b[gather]
        acc2 = np.full(idx.size, 0xCBF29CE484222325, dtype=np.uint64)
        for j in range(L):
            acc2 = ((acc2 ^ mat[:, j]) * _FNV_PRIME) & _U64_MAX
        out[idx] = acc2
    return splitmix64(out)


def token_ngram_hashes(text: str, n: int) -> np.ndarray:
    """Distinct hashes of word n-gram shingles (token mode)."""
    th = token_hashes(text)
    if th.size == 0:
        return th
    if th.size <= n:
        h = np.zeros(1, dtype=np.uint64)
        for j in range(th.size):
            h = (h * _FNV_PRIME + th[j]) & _U64_MAX
        return splitmix64(h)
    m = th.size - n + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        h = (h * _FNV_PRIME + th[j : j + m]) & _U64_MAX
    return np.unique(splitmix64(h))


def minhash_seeds(num_hashes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(1, 2**63 - 1, size=num_hashes, dtype=np.uint64)


def minhash_signatures(
    shingle_arrays: list[np.ndarray], seeds: np.ndarray, chunk: int = 16
) -> np.ndarray:
    """MinHash signatures for a batch of shingle-hash sets.

    One big vectorized pass: concatenate every doc's shingles into a single
    array, xor-mix with each seed (splitmix64 of h ^ seed is a distinct strong
    hash per seed), then ``np.minimum.reduceat`` at doc offsets gives all
    per-doc minima without any per-doc Python loop. Seeds are processed in
    chunks to bound the (chunk x total_shingles) intermediate.

    Docs with zero shingles get an all-max sentinel signature (they are
    filtered before LSH anyway).

    Returns int64 array of shape (n_docs, num_hashes) (uint64 bit-view).
    """
    n_docs = len(shingle_arrays)
    nh = seeds.size
    sig = np.full((n_docs, nh), _U64_MAX, dtype=np.uint64)
    sizes = np.fromiter((a.size for a in shingle_arrays), dtype=np.int64, count=n_docs)
    nonempty = np.flatnonzero(sizes > 0)
    if nonempty.size == 0:
        return sig.view(np.int64)
    H = np.concatenate([shingle_arrays[i] for i in nonempty])
    offsets = np.zeros(nonempty.size, dtype=np.int64)
    np.cumsum(sizes[nonempty][:-1], out=offsets[1:])
    for c0 in range(0, nh, chunk):
        s = seeds[c0 : c0 + chunk]
        mixed = splitmix64(H[None, :] ^ s[:, None])  # (c, M)
        mins = np.minimum.reduceat(mixed, offsets, axis=1)  # (c, n_nonempty)
        sig[nonempty, c0 : c0 + s.size] = mins.T
    return sig.view(np.int64)


def simhash64(token_hash_arrays: list[np.ndarray]) -> np.ndarray:
    """64-bit SimHash per doc from (term-frequency-weighted) token hashes.

    Batched: unpacks all token hashes of the batch to a bit matrix once and
    sums per-doc via ``np.add.reduceat``.
    Returns int64 array of shape (n_docs,).
    """
    n_docs = len(token_hash_arrays)
    out = np.zeros(n_docs, dtype=np.uint64)
    sizes = np.fromiter((a.size for a in token_hash_arrays), dtype=np.int64, count=n_docs)
    nonempty = np.flatnonzero(sizes > 0)
    if nonempty.size == 0:
        return out.view(np.int64)
    H = np.concatenate([token_hash_arrays[i] for i in nonempty])
    offsets = np.zeros(nonempty.size, dtype=np.int64)
    np.cumsum(sizes[nonempty][:-1], out=offsets[1:])
    # bits: (M, 64), big-endian bit order within the uint64 (order is
    # irrelevant as long as it is consistent)
    bits = np.unpackbits(H[:, None].byteswap().view(np.uint8), axis=1)  # (M, 64)
    sums = np.add.reduceat(bits.astype(np.int64), offsets, axis=0)  # (n_nonempty, 64)
    majority = (2 * sums) >= sizes[nonempty][:, None]
    packed = np.packbits(majority.astype(np.uint8), axis=1)  # (n, 8) bytes big-endian
    vals = packed.view(">u8").astype(np.uint64).reshape(-1)
    out[nonempty] = vals
    return out.view(np.int64)


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of xor for int64/uint64 arrays (vectorized)."""
    x = (a.view(np.uint64) ^ b.view(np.uint64)).copy()
    cnt = np.zeros(x.shape, dtype=np.int64)
    while x.any():
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt
