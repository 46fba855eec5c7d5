"""Maintenance/repair operators vs reference semantics (links_fix.py,
canon_fix.py) + invariant checks."""

from __future__ import annotations

from product_deduplication_spark.operators.validation import (
    conservation_check,
    dedupe_catalog_leaders,
    fix_duplicate_leader_ids,
    fix_nan_leaders,
    links_stats,
    losers_with_multiple_winners,
)

LINKS_SCHEMA = (
    "item_uuid string, item_name string, canonical_id long, "
    "canonical_leader string, canonical_member string, agent_verified int"
)


def test_fix_duplicate_leader_ids(spark):
    links = spark.createDataFrame(
        [
            ("u1", "A", 1, "coke", "coke", 0),
            ("u2", "B", 7, "coke", "coca cola", 0),  # same leader, id 7 -> 1
            ("u3", "C", 2, "sprite", "sprite", 0),
        ],
        LINKS_SCHEMA,
    )
    out = fix_duplicate_leader_ids(links)
    ids = {r["item_uuid"]: r["canonical_id"] for r in out.collect()}
    assert ids == {"u1": 1, "u2": 1, "u3": 2}


def test_fix_nan_leaders_assigns_fresh_sequential_ids(spark):
    links = spark.createDataFrame(
        [
            ("u1", "A", 5, "coke", "coke", 0),
            ("u2", "B", None, None, "mystery item", 0),
            ("u3", "C", None, None, "another item", 0),
        ],
        LINKS_SCHEMA,
    )
    out = fix_nan_leaders(links)
    rows = {r["item_uuid"]: r for r in out.collect()}
    assert rows["u2"]["canonical_leader"] == "mystery item"
    # fresh ids above max(5), gap-free, ordered by leader
    new_ids = sorted([rows["u2"]["canonical_id"], rows["u3"]["canonical_id"]])
    assert new_ids == [6, 7]
    assert rows["u3"]["canonical_id"] == 6  # 'another item' < 'mystery item'
    assert links_stats(out)["n_rows"] == 3


def test_dedupe_catalog_leaders(spark):
    cat = spark.createDataFrame(
        [(1, "coke"), (9, "coke"), (2, "sprite")],
        "canonical_id long, canonical_leader string",
    )
    out = {r["canonical_leader"]: r["canonical_id"] for r in dedupe_catalog_leaders(cat).collect()}
    assert out == {"coke": 1, "sprite": 2}


def test_conservation_and_loser_audits(spark):
    before = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    after = spark.createDataFrame([(1,), (3,)], "k long")
    missing = conservation_check(before, after, "k").collect()
    assert [r["k"] for r in missing] == [2]
    rel = spark.createDataFrame(
        [("w1", "l1"), ("w2", "l1"), ("w1", "l2")],
        "winner_entity_uuid string, loser_entity_uuid string",
    )
    bad = losers_with_multiple_winners(rel).collect()
    assert len(bad) == 1 and bad[0]["loser_entity_uuid"] == "l1"
