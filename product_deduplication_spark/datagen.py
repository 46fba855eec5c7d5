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


# --------------------------------------------------------------------------
# Deterministic media payload synthesis (multimodal self-check)
#
# Package-side minimal encoders for the two codecs the engine decodes for
# real (operators/multimodal.py: stdlib-zlib PNG, stdlib-wave RIFF/PCM).
# These exist so the in-query self-check `media_decode_selfcheck` can gate
# the full encode -> container parse -> unfilter/width-convert -> feature
# path at every driver run; the INDEPENDENT validation of the decoders
# (forward-filter writer, struct-only RIFF writer that never imports
# `wave`) stays in tests/test_png_decode.py and tests/test_wav_decode.py.
# --------------------------------------------------------------------------

def encode_wav_pcm(ints: np.ndarray, sampwidth: int, framerate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE PCM writer. ``ints`` is integer samples, shape
    (n,) mono or (n, ch): uint8 for sampwidth 1, int16 for sampwidth 2."""
    import struct

    if ints.ndim == 1:
        ints = ints[:, None]
    ch = ints.shape[1]
    if sampwidth == 1:
        frames = ints.astype(np.uint8).tobytes()
    elif sampwidth == 2:
        frames = ints.astype("<i2").tobytes()
    else:
        raise ValueError(sampwidth)
    block_align = ch * sampwidth
    fmt = struct.pack(
        "<HHIIHH", 1, ch, framerate, framerate * block_align, block_align, sampwidth * 8
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(frames))
        + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_png_gray(px: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal grayscale 8-bit PNG writer applying one forward filter type
    (0-4) to every scanline, so a payload can exercise each unfilter path."""
    import struct
    import zlib

    if px.ndim == 3:
        px = px[:, :, 0]
    h, w = px.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = px[y].astype(np.int32)
        left = np.concatenate([np.zeros(1, dtype=np.int32), cur[:-1]])
        upleft = np.concatenate([np.zeros(1, dtype=np.int32), prev[:-1]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:  # Sub
            enc = (cur - left) % 256
        elif filter_type == 2:  # Up
            enc = (cur - prev) % 256
        elif filter_type == 3:  # Average
            enc = (cur - ((left + prev) >> 1)) % 256
        elif filter_type == 4:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) % 256
        else:
            raise ValueError(filter_type)
        raw.append(filter_type)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def _chunk(ctype: bytes, payload: bytes) -> bytes:
        import zlib as _z

        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", _z.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def media_payload_for_doc(doc_id: int, dim: int = 16):
    """(payload, media_kind, expected_feature_kind, truth_feature) for a
    doc_id — fully deterministic, no external data (BASELINE.json rule).

    Routing by ``doc_id % 4``: 0 -> 16-bit mono WAV, 1 -> 8-bit stereo WAV
    (exercises downmix), 2 -> grayscale PNG with filter type
    ``(doc_id // 4) % 5`` (exercises every unfilter path across docs),
    3 -> a non-codec blob that must stub. ``truth_feature`` is computed
    DIRECTLY from the pre-encode sample/pixel arrays via the same public
    feature kernels — so equality with the engine-decoded feature proves the
    container roundtrip (parse, inflate, unfilter, width convert, downmix)
    is lossless, bit for bit."""
    from product_deduplication_spark.operators.multimodal import (
        _stub_feature,
        png_grid_feature,
        wav_envelope_feature,
    )

    rng = np.random.default_rng(0xC0FFEE ^ (doc_id * 2654435761) % (1 << 32))
    m = doc_id % 4
    if m == 0:
        n = 400 + (doc_id % 7) * 100
        ints = rng.integers(-32768, 32768, size=n).astype(np.int16)
        payload = encode_wav_pcm(ints, sampwidth=2)
        truth = wav_envelope_feature(ints.astype(np.float64) / 32768.0, dim)
        return payload, "audio", "wav-stdlib", truth
    if m == 1:
        n = 300 + (doc_id % 5) * 100
        u8 = rng.integers(0, 256, size=(n, 2)).astype(np.uint8)
        payload = encode_wav_pcm(u8, sampwidth=1)
        mono = ((u8.astype(np.float64) - 128.0) / 128.0).mean(axis=1)
        truth = wav_envelope_feature(mono, dim)
        return payload, "audio", "wav-stdlib", truth
    if m == 2:
        h, w = 8 + doc_id % 5, 8 + doc_id % 3
        px = rng.integers(0, 256, size=(h, w, 1)).astype(np.uint8)
        payload = encode_png_gray(px, filter_type=(doc_id // 4) % 5)
        truth = png_grid_feature(px, dim)
        return payload, "image", "png-stdlib", truth
    payload = b"BLOB" + rng.integers(0, 256, size=64).astype(np.uint8).tobytes()
    truth = _stub_feature(payload, dim)
    return payload, "video", "stub", truth
