"""Parity gate: Spark EP1 pipeline vs bug-for-bug pandas oracle —
normalization byte-identical, dup-pair recall >= 0.99, cluster partitions
equal (SURVEY.md §5.2)."""

from __future__ import annotations

import pandas as pd
import pytest

from product_deduplication_spark.datagen import generate_raw_catalog
from product_deduplication_spark.functions.normalize import (
    levenshtein_ratio,
    token_sort_ratio,
)
from product_deduplication_spark.oracle import reference_oracle as RO
from product_deduplication_spark.oracle.brute_force import clusters_to_pairs
from product_deduplication_spark.parity import grocery_dedup, uuid_argmax_dedup


def test_token_sort_ratio_reference_values():
    # values cross-checked against fuzzywuzzy semantics
    assert token_sort_ratio("coca cola 330ml", "330ml coca cola") == 100
    assert token_sort_ratio("abc", "abc") == 100
    assert token_sort_ratio("", "") == 100
    assert token_sort_ratio("abc", "") == 0
    assert levenshtein_ratio("abcd", "abce") == 75  # 1 sub -> (8-2)/8
    assert levenshtein_ratio("abcd", "abc") == 86  # 1 del -> round(6/7*100)
    r = token_sort_ratio("heinz baked beans 400g", "heinz baked bean 400g")
    assert 90 <= r < 100


@pytest.fixture(scope="module")
def catalog():
    return generate_raw_catalog(n_products=60, seed=42)


def test_normalization_byte_identical(spark, catalog):
    """The per-row invariant: Spark normalize == pandas oracle, byte for
    byte (BASELINE.json input_hint analog for the parity path)."""
    oracle_clean = RO.nlp_cleaning(RO.remove_duplication_for_uuid(catalog), [])
    sdf = spark.createDataFrame(catalog)
    from product_deduplication_spark.functions.normalize import normalize_names

    spark_clean = (
        normalize_names(uuid_argmax_dedup(sdf), "item_name")
        .select("item_uuid", "product_name")
        .toPandas()
    )
    merged = oracle_clean[["item_uuid", "product_name"]].merge(
        spark_clean, on="item_uuid", suffixes=("_oracle", "_spark")
    )
    assert len(merged) == len(oracle_clean)
    mismatch = merged[merged["product_name_oracle"] != merged["product_name_spark"]]
    assert mismatch.empty, mismatch.head()


def test_cluster_parity_recall(spark, catalog):
    oracle_clean, oracle_labels = RO.reference_pipeline(catalog)
    truth_pairs = clusters_to_pairs(oracle_labels)
    sdf = spark.createDataFrame(catalog)
    got = {
        r["product_name"]: r["cluster_id"] for r in grocery_dedup(sdf).collect()
    }
    got_pairs = clusters_to_pairs(got)
    assert truth_pairs, "oracle found no duplicate pairs — fixture too easy"
    recall = len(got_pairs & truth_pairs) / len(truth_pairs)
    assert recall >= 0.99, (recall, len(truth_pairs))
    # precision: verification predicate is exactly the oracle's
    extras = got_pairs - truth_pairs
    assert not extras, sorted(extras)[:5]
    # same name universe
    assert set(got) == set(oracle_labels)
