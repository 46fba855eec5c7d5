"""Brute-force O(n^2) exact-Jaccard oracle + union-find clustering.

Computes, for every doc pair, the exact Jaccard over the SAME shingle config
the engine uses (hashing.char_shingle_hashes / token_ngram_hashes) — the
"same shingle/signature config" clause of the BASELINE.json recall gate.
The Spark pipeline's verified edge set must cover >= 0.99 of the pairs this
oracle finds at the threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from product_deduplication_spark.config import DedupConfig
from product_deduplication_spark.functions import hashing


def shingle_sets(texts: list[str], cfg: DedupConfig) -> list[np.ndarray]:
    if cfg.shingle_mode == "char":
        return [hashing.char_shingle_hashes(t, cfg.shingle_k) for t in texts]
    return [hashing.token_ngram_hashes(t, cfg.shingle_k) for t in texts]


def exact_jaccard_pairs(
    ids: list, texts: list[str], cfg: DedupConfig
) -> pd.DataFrame:
    """All pairs (id_a < id_b) with exact Jaccard >= cfg.jaccard_threshold."""
    sets = shingle_sets(texts, cfg)
    rows = []
    n = len(ids)
    for i in range(n):
        si = sets[i]
        if si.size == 0:
            continue
        for j in range(i + 1, n):
            sj = sets[j]
            if sj.size == 0:
                continue
            inter = np.intersect1d(si, sj, assume_unique=True).size
            union = si.size + sj.size - inter
            sim = inter / union if union else 0.0
            if sim >= cfg.jaccard_threshold:
                a, b = ids[i], ids[j]
                if b < a:
                    a, b = b, a
                rows.append((a, b, sim))
    return pd.DataFrame(rows, columns=["src", "dst", "similarity"])


def union_find_clusters(nodes: list, edges: list[tuple]) -> dict:
    """node -> min-member component label (python oracle for CC tests)."""
    parent = {n: n for n in nodes}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in nodes}


def pair_recall(found: set[tuple], truth: set[tuple]) -> float:
    if not truth:
        return 1.0
    return len(found & truth) / len(truth)


def clusters_to_pairs(labels: dict) -> set[tuple]:
    """Partition -> set of intra-cluster pairs (for cluster-equivalence
    comparison as pair sets, SURVEY.md §5.2)."""
    from collections import defaultdict

    groups = defaultdict(list)
    for node, lab in labels.items():
        groups[lab].append(node)
    pairs = set()
    for members in groups.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs
