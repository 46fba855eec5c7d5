"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1).

Generates the BASELINE.json input_hint table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
with injected duplicates at known mutation rates, plus ground truth:

- ``truth_pairs(url_a, url_b, kind)``, kind in {exact, near, substring}
- ``truth_clusters(url, cluster_id)`` = connected components of truth_pairs

Fully seeded (numpy default_rng) — same (n_docs, seed) always yields
byte-identical parquet content. html is a fixed wrapper of text so extracted
text is a pure function of html bytes (byte-identical invariant,
BASELINE.json input_hint).

Can also wrap the driver-provided ``documents.parquet`` text
(/root/testdata, TESTDATA.md) into the same shape via ``wrap_documents``.
"""

from __future__ import annotations

import datetime as dt
import html as _html

import numpy as np
import pandas as pd

_VOCAB_SIZE = 5000
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "en", "es", "pt", "de"]
_BASE_TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

HTML_PREFIX = "<html><body><p>"
HTML_SUFFIX = "</p></body></html>"


def _vocab(rng: np.random.Generator) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lengths = rng.integers(3, 10, size=_VOCAB_SIZE)
    return np.array(["".join(rng.choice(letters, size=n)) for n in lengths])


def text_to_html(text: str) -> bytes:
    return (HTML_PREFIX + _html.escape(text) + HTML_SUFFIX).encode("utf-8")


def _mutate(tokens: list[str], rate: float, rng: np.random.Generator, vocab: np.ndarray) -> list[str]:
    """Token-level swap/drop/insert at the given rate (FIXTURES.md F1)."""
    out: list[str] = []
    for tok in tokens:
        r = rng.random()
        if r < rate / 3:
            out.append(str(rng.choice(vocab)))  # substitute
        elif r < 2 * rate / 3:
            continue  # drop
        elif r < rate:
            out.append(tok)
            out.append(str(rng.choice(vocab)))  # insert
        else:
            out.append(tok)
    return out if out else tokens[:1]


def generate_web_documents(
    n_base_docs: int = 1000,
    seed: int = 42,
    dup_fraction: float = 0.25,
    substring_fraction: float = 0.05,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (docs, truth_pairs) pandas frames.

    docs: url, warc_ts, html (bytes), text, lang
    truth_pairs: url_a, url_b, kind
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    # zipf-ish token distribution
    ranks = np.arange(1, _VOCAB_SIZE + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()

    rows: list[tuple[str, dt.datetime, str, str]] = []
    pairs: list[tuple[str, str, str]] = []
    i = 0

    def url_for(j: int) -> str:
        return f"https://host{j % 997}.example/p/{j}"

    def add(text: str, lang: str) -> str:
        nonlocal i
        u = url_for(i)
        rows.append((u, _BASE_TS + dt.timedelta(seconds=i), text, lang))
        i += 1
        return u

    mutation_rates = [0.0, 0.02, 0.05, 0.15]
    for _ in range(n_base_docs):
        n_tok = int(rng.integers(50, 500))
        tokens = list(rng.choice(vocab, size=n_tok, p=probs))
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        base_url = add(" ".join(tokens), lang)
        r = rng.random()
        if r < dup_fraction:
            n_copies = int(rng.integers(1, 4))
            for _ in range(n_copies):
                rate = mutation_rates[int(rng.integers(0, len(mutation_rates)))]
                if rate == 0.0:
                    dup_url = add(" ".join(tokens), lang)
                    pairs.append((base_url, dup_url, "exact"))
                else:
                    mut = _mutate(tokens, rate, rng, vocab)
                    dup_url = add(" ".join(mut), lang)
                    pairs.append((base_url, dup_url, "near"))
        elif r < dup_fraction + substring_fraction and n_tok >= 120:
            # contiguous slice >= 50% of the doc
            start = int(rng.integers(0, n_tok // 4))
            length = int(rng.integers(n_tok // 2, n_tok - start))
            sub_url = add(" ".join(tokens[start : start + length]), lang)
            pairs.append((base_url, sub_url, "substring"))

    docs = pd.DataFrame(rows, columns=["url", "warc_ts", "text", "lang"])
    docs["html"] = docs["text"].map(text_to_html)
    docs = docs[["url", "warc_ts", "html", "text", "lang"]]
    truth = pd.DataFrame(pairs, columns=["url_a", "url_b", "kind"])
    return docs, truth


def truth_clusters(truth_pairs: pd.DataFrame) -> pd.DataFrame:
    """Connected components of truth pairs via union-find (test oracle)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(truth_pairs["url_a"], truth_pairs["url_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    urls = sorted(parent)
    return pd.DataFrame({"url": urls, "cluster_id": [find(u) for u in urls]})


_BRANDS = ["coca cola", "pepsi", "fanta", "sprite", "nestle", "kellogs", "heinz",
           "cadbury", "walkers", "tropicana", "evian", "danone"]
_PRODUCTS = ["orange juice", "chocolate bar", "crisps", "baked beans", "spring water",
             "corn flakes", "yogurt", "cola drink", "lemonade", "tomato ketchup"]
_SIZES = ["330ml", "500ml", "1l", "2l", "250g", "400g", "6 x 330ml", "4 pack", "750ml"]


def generate_raw_catalog(n_products: int = 120, seed: int = 42) -> pd.DataFrame:
    """FIXTURES.md F2: grocery-style raw catalog with the noise classes the
    reference cleans (case, @tokens, special chars, 'pm 99p' promo suffixes,
    duplicated uuids) plus injected near-duplicate names (token reorder /
    light typo) that the reference pipeline should cluster."""
    rng = np.random.default_rng(seed)
    rows = []
    uid = 0

    def noisy(name: str) -> str:
        r = rng.random()
        if r < 0.25:
            name = name.upper()
        elif r < 0.4:
            name = name.title()
        if rng.random() < 0.2:
            name += " pm 99p"
        if rng.random() < 0.15:
            name += " @promo"
        if rng.random() < 0.15:
            name = name.replace(" ", " & ", 1)
        return name

    for _ in range(n_products):
        base = f"{rng.choice(_BRANDS)} {rng.choice(_PRODUCTS)} {rng.choice(_SIZES)}"
        n_variants = int(rng.integers(1, 4))
        for _v in range(n_variants):
            toks = base.split()
            if _v > 0 and rng.random() < 0.5:
                rng.shuffle(toks)  # token reorder: token_sort_ratio-invariant
            name = noisy(" ".join(toks))
            rows.append(
                (
                    f"uuid-{uid:05d}",
                    name,
                    int(rng.integers(0, 5000)),
                    f"https://img.example/{uid}.jpg" if rng.random() > 0.1 else None,
                )
            )
            uid += 1
    # duplicated uuids: same uuid, two names (exercises remove_duplication_for_uuid)
    for i in range(0, min(20, len(rows) - 1), 2):
        u, name, sold, img = rows[i]
        rows.append((u, rows[i + 1][1], sold // 2, img))
    return pd.DataFrame(rows, columns=["item_uuid", "item_name", "number_sku_sold", "image_url"])


def wrap_documents_spark(documents_sdf):
    """Spark-native ``wrap_documents``: build the input_hint shape
    (url, warc_ts, html, text, lang) from the driver's documents table with
    pure JVM expressions — no driver collect, no Python UDF. Byte-identical
    to the pandas version (tested in tests/test_datagen.py): the html escape
    chain replicates ``html.escape(text, quote=True)`` (& first)."""
    from pyspark.sql import functions as F

    base_epoch = int(_BASE_TS.timestamp())
    esc = F.col("text")
    for raw, rep in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                     ('"', "&quot;"), ("'", "&#x27;")]:
        esc = F.replace(esc, F.lit(raw), F.lit(rep))
    return documents_sdf.select(
        F.concat(F.lit("https://docs.example/d/"), F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(base_epoch) + F.col("doc_id").cast("long")).alias("warc_ts"),
        F.encode(F.concat(F.lit(HTML_PREFIX), esc, F.lit(HTML_SUFFIX)), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def wrap_documents(documents_pdf: pd.DataFrame) -> pd.DataFrame:
    """Wrap the driver's documents table (doc_id, text, lang, ...) into the
    input_hint shape (url, warc_ts, html, text, lang)."""
    out = pd.DataFrame(
        {
            "url": documents_pdf["doc_id"].map(lambda d: f"https://docs.example/d/{d}"),
            "warc_ts": documents_pdf["doc_id"].map(
                lambda d: _BASE_TS + dt.timedelta(seconds=int(d))
            ),
            "html": documents_pdf["text"].map(text_to_html),
            "text": documents_pdf["text"],
            "lang": documents_pdf["lang"],
        }
    )
    return out
