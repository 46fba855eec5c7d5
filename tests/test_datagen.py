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


def test_wrap_documents_spark_matches_pandas(spark):
    """The JVM-expression wrap must be byte-identical to the pandas wrap
    (url, warc_ts instant, html bytes, text, lang)."""
    from product_deduplication_spark.datagen import wrap_documents, wrap_documents_spark

    sdf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = (
        wrap_documents_spark(sdf)
        .orderBy("url")
        .toPandas()
    )
    want = wrap_documents(sdf.toPandas()).sort_values("url", ignore_index=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["text"]) == list(want["text"])
    assert list(got["lang"]) == list(want["lang"])
    assert [bytes(b) for b in got["html"]] == [bytes(b) for b in want["html"]]
    # same instants (tz-normalize both sides)
    import pandas as pd

    g = pd.to_datetime(got["warc_ts"]).dt.tz_localize("UTC") if got["warc_ts"].dt.tz is None else pd.to_datetime(got["warc_ts"]).dt.tz_convert("UTC")
    w = pd.to_datetime(want["warc_ts"]).dt.tz_convert("UTC")
    assert list(g) == list(w)
