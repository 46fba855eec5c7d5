"""Physical-plan properties (Catalyst integration) + skew-safety.

The scale story isn't just wall clock: these tests pin the plan shapes —
predicate pushdown reaches the parquet scan, column pruning trims ReadSchema,
small dims broadcast, and hot LSH buckets produce O(n) star edges instead of
O(n^2) pairs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from product_deduplication_spark.config import DedupConfig
from product_deduplication_spark.functions.features import with_features
from product_deduplication_spark.operators.lsh import candidate_pairs
from product_deduplication_spark.plans import queries as Q


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    plan = _plan(Q.q_scan_filter_project(spark, sf_dir))
    assert "PushedFilters" in plan
    # the quantity predicate must be pushed, not evaluated post-scan only
    assert "GreaterThan(l_quantity" in plan, plan[:2000]


def test_column_pruning_trims_read_schema(spark, sf_dir):
    plan = _plan(Q.q_scan_filter_project(spark, sf_dir))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan[:1000]
    line = read_schema[0]
    # only the 4 referenced columns are read — not l_extendedprice etc.
    assert "l_extendedprice" not in line
    assert "l_quantity" in line and "l_orderkey" in line


def test_small_dim_broadcasts(spark, sf_dir):
    plan = _plan(Q.q_join_inner(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_hot_bucket_produces_linear_edges(spark):
    """1000 byte-identical docs share every band: a naive pair join emits
    ~499,500 pairs; the hub-star path must emit exactly n-1."""
    n = 1000
    docs = pd.DataFrame(
        {"doc_id": range(n), "text": ["identical boilerplate page text " * 10] * n}
    )
    cfg = DedupConfig(shuffle_partitions=8, bucket_cap=64)
    feats = with_features(spark.createDataFrame(docs), cfg).select(
        "doc_id", "shingles", "minhash", "simhash"
    )
    pairs = candidate_pairs(feats, cfg)
    assert pairs.count() == n - 1


def test_mixed_hot_and_normal_buckets(spark):
    """Hot group star-connects; small distinct near-dup pairs still pair up."""
    import random

    rng = random.Random(7)
    vocab = [f"w{k}" for k in range(3000)]
    hot = ["identical boilerplate page text " * 10] * 200
    normal = [" ".join(rng.sample(vocab, 60)) for _ in range(20)]
    docs = pd.DataFrame({"doc_id": range(220), "text": hot + normal})
    cfg = DedupConfig(shuffle_partitions=8, bucket_cap=64)
    feats = with_features(spark.createDataFrame(docs), cfg).select(
        "doc_id", "shingles", "minhash", "simhash"
    )
    n_pairs = candidate_pairs(feats, cfg).count()
    # hot star: 199 edges; normal docs are mutually dissimilar -> few extras
    assert 199 <= n_pairs <= 199 + 40


def _sig_features(spark, rows):
    """Hand-built (doc_id, minhash) features for surgical LSH tests."""
    return spark.createDataFrame(
        [(i, sig) for i, sig in rows], "doc_id long, minhash array<long>"
    )


# 4-band/2-row config: band slices are sig[0:2], sig[2:4], sig[4:6], sig[6:8]
_LSH_CFG = DedupConfig(num_hashes=8, lsh_bands=4, bucket_cap=4, shuffle_partitions=8)


def _two_hot_band_fixture():
    """A (50) and B (51) agree ONLY on bands 0 and 1, and BOTH those buckets
    are hot (shared with 10 fillers each, hubs 0 and 20 — not duplicates of
    A/B). The only way to candidate (A, B) directly is secondary re-banding."""
    rows = []
    for i in range(10):  # band-0 hot fillers, hub = 0
        rows.append((i, [1, 1] + [10_000 + i, 1] + [20_000 + i, 1] + [30_000 + i, 1]))
    for i in range(10):  # band-1 hot fillers, hub = 20
        rows.append((20 + i, [40_000 + i, 1] + [2, 2] + [50_000 + i, 1] + [60_000 + i, 1]))
    rows.append((50, [1, 1] + [2, 2] + [70_001, 1] + [70_002, 1]))
    rows.append((51, [1, 1] + [2, 2] + [80_001, 1] + [80_002, 1]))
    return rows


def test_hot_bucket_secondary_reband_recovers_pair(spark):
    """Two docs whose only collisions are hot buckets must still become a
    DIRECT candidate pair (not just hub-star edges that verification can
    drop when the hub isn't a true duplicate)."""
    feats = _sig_features(spark, _two_hot_band_fixture())
    pairs = {(r["src"], r["dst"]) for r in candidate_pairs(feats, _LSH_CFG).collect()}
    assert (50, 51) in pairs
    # hub stars still present and linear
    assert (0, 50) in pairs and (20, 51) in pairs


def test_bootstrap_fast_path_equals_general_path(spark):
    """The bootstrap fast path (packed single-long bucket keys, no is_new
    column, primitive member arrays) must emit EXACTLY the general path's
    pair set when every doc is new. Force the general path by passing
    delta_ids = all ids; cover small buckets, hot buckets, secondary
    re-banding, and still-hot stars via the fixture + a boilerplate block."""
    rows = _two_hot_band_fixture()
    # a bucket-cap-busting block of identical signatures (still-hot sub-
    # buckets + hub star) on top of the fixture's hot/reband cases
    rows += [(100 + i, [7, 7, 8, 8, 9, 9, 10, 10]) for i in range(10)]
    cfg = _LSH_CFG.with_(bucket_cap=4)
    feats = _sig_features(spark, rows)
    fast = {(r["src"], r["dst"]) for r in candidate_pairs(feats, cfg).collect()}
    all_ids = feats.select(F.col("doc_id"))
    general = {
        (r["src"], r["dst"])
        for r in candidate_pairs(feats, cfg, delta_ids=all_ids).collect()
    }
    assert fast == general
    assert (50, 51) in fast and (100, 101) in fast


def test_delta_candidates_equal_new_vs_all(spark):
    """Delta mode emits exactly the full-mode pairs that touch a new doc —
    per-batch cost proportional to the delta, zero recall loss."""
    feats = _sig_features(spark, _two_hot_band_fixture())
    full = {(r["src"], r["dst"]) for r in candidate_pairs(feats, _LSH_CFG).collect()}
    delta = spark.createDataFrame([(51,)], "doc_id long")
    got = {
        (r["src"], r["dst"])
        for r in candidate_pairs(feats, _LSH_CFG, delta_ids=delta).collect()
    }
    want = {(s, d) for (s, d) in full if s == 51 or d == 51}
    assert got == want
    assert all(s == 51 or d == 51 for (s, d) in got)


def test_delta_candidates_new_min_id_hub_reaches_old_members(spark):
    """A new doc that becomes the hot bucket's min-id hub must still emit
    star edges to the OLD members (otherwise the new doc is orphaned)."""
    rows = _two_hot_band_fixture()
    rows.append((-1, [1, 1] + [90_001, 1] + [90_002, 1] + [90_003, 1]))  # new min id
    feats = _sig_features(spark, rows)
    delta = spark.createDataFrame([(-1,)], "doc_id long")
    got = {
        (r["src"], r["dst"])
        for r in candidate_pairs(feats, _LSH_CFG, delta_ids=delta).collect()
    }
    # -1 is the new hub of the hot band-0 bucket: stars to every old member
    assert (-1, 0) in got and (-1, 50) in got and (-1, 51) in got


def test_canonical_upsert_never_forces_broadcast(spark):
    """member_index / leader_index grow with the corpus — the upsert must
    not FORCE a broadcast of them (AQE may still pick one at runtime when
    the side is actually small; what's banned is the unconditional hint
    that would OOM the driver at 100x)."""
    from product_deduplication_spark.operators.canonical import upsert_canonical

    catalog = spark.createDataFrame(
        [(1, "leader a")], "canonical_id long, canonical_leader string"
    )
    links = spark.createDataFrame(
        [("u1", "n1", 1, "leader a", "member a", 0)],
        "item_uuid string, item_name string, canonical_id long, "
        "canonical_leader string, canonical_member string, agent_verified int",
    )
    groups = spark.createDataFrame(
        [(10, "leader b", "member b", "u2", "n2")],
        "group_id long, leader string, member string, item_uuid string, item_name string",
    )
    out_cat, out_links = upsert_canonical(catalog, links, groups)
    for df in (out_cat, out_links):
        lines = df._jdf.queryExecution().analyzed().toString().splitlines()
        for i, ln in enumerate(lines):
            if "ResolvedHint" in ln:
                # the only allowed forced broadcast is the O(numPartitions)
                # offsets map inside assign_sequential_ids
                nxt = lines[i + 1] if i + 1 < len(lines) else ""
                assert "_pid" in nxt and "_offset" in nxt, "\n".join(lines[i : i + 3])


def test_verify_join_never_broadcasts_features(spark):
    """The signature/shingle sides of verify_pairs grow with the corpus —
    the plan must use merge joins there regardless of (mis)estimated sizes
    (regression: a static broadcast of the features side collected ~1 GiB
    to the driver at 370k docs)."""
    from product_deduplication_spark.operators.verify import verify_pairs

    cfg = DedupConfig(shuffle_partitions=8)
    feats = with_features(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": range(20), "text": [f"doc text {i} " * 20 for i in range(20)]})
        ),
        cfg,
    ).select("doc_id", "shingles", "minhash", "simhash", "bands")
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    plan = _plan(verify_pairs(pairs, feats, cfg))
    assert "BroadcastHashJoin" not in plan, plan[:3000]


def test_no_forced_broadcast_of_corpus_sides_across_operators(spark):
    """Sweep the operator surface: NO operator may carry an unconditional
    broadcast hint on a corpus-derived side (relations, barcodes, images,
    links, features all grow with the catalog — a forced broadcast OOMs the
    driver at 100x; regression class: verify_pairs at 370k docs, round-2
    canonical/winner/linkage fixes, round-3 enrichment.propagate_barcodes).

    Allowed ResolvedHints: the O(numPartitions) _pid/_offset map inside
    assign_sequential_ids and the 1-row _mu/_sd scalar-stats frame in
    score_entities — both bounded by construction, not by data size."""
    from product_deduplication_spark.operators.canonical import (
        append_missing_members,
        bootstrap_canonical,
        upsert_canonical,
    )
    from product_deduplication_spark.operators.enrichment import (
        agg_images_bulk_reference_shape,
        barcode_bulk_rows,
        propagate_barcodes,
        propagate_images,
    )
    from product_deduplication_spark.operators.winner import score_entities

    rel = spark.createDataFrame(
        [("w1", "l1")], "winner_entity_uuid string, loser_entity_uuid string"
    )
    barcodes = spark.createDataFrame(
        [("w1", "111", "PRODUCT_IDENTIFIER_TYPE_PLU"),
         ("l1", "2222222", "PRODUCT_IDENTIFIER_TYPE_GTIN")],
        "entity_uuid string, gtins string, gtin_types string",
    )
    imgs = spark.createDataFrame(
        [("l1", "http://img/a.jpg", "IMAGE_SOURCE_CATALOG")],
        "ucpc_entity_uuid string, image_1 string, image_source_1 string",
    )
    links = spark.createDataFrame(
        [("u1", "n1", 1, "leader a", "member a", 0)],
        "item_uuid string, item_name string, canonical_id long, "
        "canonical_leader string, canonical_member string, agent_verified long",
    )
    catalog = spark.createDataFrame(
        [(1, "leader a")], "canonical_id long, canonical_leader string"
    )
    groups = spark.createDataFrame(
        [(10, "leader b", "member b", "u2", "n2")],
        "group_id long, leader string, member string, item_uuid string, item_name string",
    )
    missing = spark.createDataFrame([("m1", "New Prod")], "item_uuid string, item_name string")
    score_in = spark.createDataFrame(
        [("e1", *([1] * 14), 10, 8, 2, 10)],
        "entity_uuid string, "
        + ", ".join(
            f"{c} int"
            for c in __import__(
                "product_deduplication_spark.operators.winner", fromlist=["ATTRIBUTE_WEIGHTS"]
            ).ATTRIBUTE_WEIGHTS
        )
        + ", scans int, correct_scans int, incorrect_scans int, linked_products int",
    )

    propagated = propagate_barcodes(rel, barcodes)
    boot_cat, boot_links = bootstrap_canonical(groups)
    ups_cat, ups_links = upsert_canonical(catalog, links, groups)
    app_cat, app_links = append_missing_members(catalog, links, missing)
    outputs = {
        "propagate_barcodes": propagated,
        "barcode_bulk_rows": barcode_bulk_rows(propagated, barcodes),
        "agg_images_bulk": agg_images_bulk_reference_shape(rel, imgs, n_slots=1),
        "propagate_images": propagate_images(rel, imgs, n_slots=1),
        "bootstrap_links": boot_links,
        "upsert_links": ups_links,
        "append_catalog": app_cat,
        "append_links": app_links,
        "score_entities": score_entities(score_in),
    }
    for name, df in outputs.items():
        lines = df._jdf.queryExecution().analyzed().toString().splitlines()
        for i, ln in enumerate(lines):
            if "ResolvedHint" not in ln:
                continue
            ctx = "\n".join(lines[i : i + 4])
            assert ("_pid" in ctx and "_offset" in ctx) or (
                "_mu" in ctx and "_sd" in ctx
            ), f"{name}: forced broadcast of a corpus-derived side:\n{ctx}"


def _exchange_blocks(plan: str) -> list[str]:
    """Detail blocks of the formatted plan belonging to Exchange nodes."""
    blocks, cur, keep = [], [], False
    for ln in plan.splitlines():
        if ln.startswith("(") and ") " in ln:
            if keep and cur:
                blocks.append("\n".join(cur))
            keep = ") Exchange" in ln
            cur = [ln]
        elif cur:
            cur.append(ln)
    if keep and cur:
        blocks.append("\n".join(cur))
    return blocks


def test_winner_orderkey_keeps_text_out_of_exchanges(spark, sf_dir):
    """pick_winners with a precomputed ``_text_len`` (what run_dedup now
    passes): the text payload must not cross ANY exchange for a consumer
    that doesn't select it — the length is computed below the label join,
    so column pruning drops text from the join and window shuffles. The
    length(text)-above-the-join form (frozen callers without the column)
    must still produce the identical winner set."""
    from product_deduplication_spark.pipeline import pick_winners

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("url", F.concat(F.lit("u"), F.col("doc_id").cast("string")))
    )
    labels = docs.select(
        F.col("doc_id").alias("node"), (F.col("doc_id") % 7).alias("component")
    )

    def clusters(d):
        return (
            d.join(labels, d["doc_id"] == labels["node"])
            .withColumn("cluster_id", F.col("component"))
            .drop("node", "component")
        )

    narrow = pick_winners(clusters(docs.withColumn("_text_len", F.length("text"))))
    wide = pick_winners(clusters(docs))

    out = narrow.select("cluster_id", "is_winner")
    for block in _exchange_blocks(_plan(out)):
        assert "text#" not in block, f"text payload crosses an exchange:\n{block}"
    # control: the length(text)-above-the-join form ships text through a shuffle
    assert any(
        "text#" in b for b in _exchange_blocks(_plan(wide.select("cluster_id", "is_winner")))
    )

    got = sorted(
        narrow.where("is_winner").select("cluster_id", "url").collect()
    )
    want = sorted(wide.where("is_winner").select("cluster_id", "url").collect())
    assert got == want and len(got) == 7
