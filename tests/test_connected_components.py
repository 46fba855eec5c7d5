"""CC correctness vs a union-find oracle (SURVEY.md §5.1: invariant under
edge permutation; exact component equality)."""

from __future__ import annotations

import random

import pytest

from product_deduplication_spark.operators.connected_components import (
    assign_clusters,
    connected_components,
)
from product_deduplication_spark.oracle.brute_force import union_find_clusters


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_cc_simple_chain(spark):
    labels = _run(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_self_loops_and_duplicates(spark):
    labels = _run(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert labels == {1: 1, 2: 1}


def test_cc_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


@pytest.mark.parametrize("seed", [0, 1])
def test_cc_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    labels = _run(spark, edges)
    involved = sorted({n for e in edges for n in e if e[0] != e[1]})
    oracle = union_find_clusters(involved, [e for e in edges if e[0] != e[1]])
    assert labels == {n: oracle[n] for n in involved}


def test_cc_edge_permutation_invariance(spark):
    rng = random.Random(3)
    edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(40)]
    l1 = _run(spark, edges)
    shuffled = edges[:]
    rng.shuffle(shuffled)
    l2 = _run(spark, [(b, a) for a, b in shuffled])
    assert l1 == l2


def test_assign_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "doc_id long, text string")
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    rows = {r["doc_id"]: r["cluster_id"] for r in assign_clusters(docs, edges).collect()}
    assert rows == {1: 1, 2: 1, 99: 99}
