"""Cross-catalog barcode linkage vs reference semantics (match_barcode.py)."""

from __future__ import annotations

from product_deduplication_spark.operators.linkage import match_barcodes_to_canonical


def test_match_barcodes_direct_and_fuzzy(spark):
    catalog = spark.createDataFrame(
        [
            (1, "coca cola orange 330ml"),
            (2, "heinz baked beans 400g"),
            (3, "obscure item nobody sells"),
        ],
        "canonical_id long, canonical_leader string",
    )
    links = spark.createDataFrame(
        [
            ("COCA COLA ORANGE 330ML", 1, "coca cola orange 330ml"),
        ],
        "item_name string, canonical_id long, canonical_leader string",
    )
    eans = spark.createDataFrame(
        [
            ("5000001", "COCA COLA ORANGE 330ML"),      # direct (via links item_name)
            ("5000002", "heinz baked beanz 400g"),      # fuzzy >= 85 + package match
            ("5000003", "totally unrelated product 1kg"),
        ],
        "ean string, item_name string",
    )
    out = {r["canonical_id"]: r["ean"] for r in
           match_barcodes_to_canonical(eans, catalog, links).collect()}
    assert out[1] == "5000001"   # direct back door
    assert out[2] == "5000002"   # similarity match
    assert out[3] is None        # unmatched stays NULL


def test_one_barcode_per_product(spark):
    catalog = spark.createDataFrame(
        [(1, "sprite lemonade 2l")], "canonical_id long, canonical_leader string"
    )
    links = spark.createDataFrame(
        [], "item_name string, canonical_id long, canonical_leader string"
    )
    eans = spark.createDataFrame(
        [("111", "sprite lemonade 2l"), ("222", "sprite lemonad 2l")],
        "ean string, item_name string",
    )
    rows = match_barcodes_to_canonical(eans, catalog, links).collect()
    assert len(rows) == 1
    # exact name wins (fuzz 100 beats the typo'd variant)
    assert rows[0]["ean"] == "111"
