from __future__ import annotations

from product_deduplication_spark.datagen import (
    generate_web_documents,
    text_to_html,
    truth_clusters,
)


def test_generator_deterministic():
    d1, t1 = generate_web_documents(n_base_docs=50, seed=7)
    d2, t2 = generate_web_documents(n_base_docs=50, seed=7)
    assert d1.equals(d2)
    assert t1.equals(t2)
    d3, _ = generate_web_documents(n_base_docs=50, seed=8)
    assert not d1["text"].equals(d3["text"])


def test_generator_schema_and_truth():
    docs, truth = generate_web_documents(n_base_docs=200, seed=42)
    assert list(docs.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert docs["url"].is_unique
    assert docs["html"].map(lambda b: isinstance(b, bytes)).all()
    assert set(truth["kind"]) <= {"exact", "near", "substring"}
    assert (truth["kind"] == "exact").any()
    assert (truth["kind"] == "near").any()
    # html is the deterministic wrapper of text
    assert (docs["html"] == docs["text"].map(text_to_html)).all()
    # truth clusters are valid partitions
    tc = truth_clusters(truth)
    assert tc["url"].is_unique
    assert set(tc["cluster_id"]) <= set(tc["url"])
