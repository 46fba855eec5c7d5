"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Training-data-pipeline ops over binary payload columns. The decode kernels
(image decode, audio resample, video frame extraction) require codec
libraries that are NOT in this container, so the decode step is stubbed
behind ``DecodeBackend`` — either raising ``NotImplementedError`` (strict
mode) or producing a deterministic fake (test mode). Everything Spark-side
is real and tested: schemas, Arrow batch shapes, ``mapInPandas`` streaming
(binary payloads never accumulate on the driver), partition sizing by
byte budget.

Schema convention:
    media(doc_url string, kind string, payload binary,
          meta struct<mime string, width int, height int, duration_ms int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha256", T.StringType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        # provenance of the feature vector: the decode backend's name, or
        # "stub" for the deterministic fake — downstream consumers must be
        # able to tell sha-seeded test vectors from real embeddings without
        # reading a docstring
        T.StructField("feature_kind", T.StringType(), True),
    ]
)


class DecodeBackend:
    """Pluggable decode kernel. The real implementation would wrap PIL /
    torchaudio / pyav; neither is installed here, so:

    - ``strict=True``  → raise NotImplementedError (production default until
      a codec backend is wired in)
    - ``strict=False`` → deterministic fake feature: a unit-norm float
      vector seeded by sha256(payload) — stable across processes, good
      enough to exercise the whole distributed path end-to-end.
    """

    def __init__(self, dim: int = 16, strict: bool = False):
        self.dim = dim
        self.strict = strict

    @property
    def feature_kind(self) -> str:
        """Provenance label stamped on every output row. The base class's
        non-strict path emits deterministic fakes — labeled ``"stub"`` so
        they can never be mistaken for real embeddings; a real backend
        subclass overrides this with its codec/model name."""
        return "stub"

    def decode_features(self, payload: bytes | None) -> np.ndarray | None:
        if payload is None:
            return None
        if self.strict:
            raise NotImplementedError(
                "media decode requires a codec backend (PIL/pyav) not present "
                "in this environment; run with strict=False for the "
                "deterministic stub"
            )
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(self.dim).astype(np.float32)
        return v / np.linalg.norm(v)


def extract_media_features(
    media: DataFrame, backend: DecodeBackend | None = None, batch_budget_bytes: int = 64 << 20
) -> DataFrame:
    """mapInPandas over binary payloads → per-item features + content hash.

    Scale notes: ``mapInPandas`` streams Arrow batches, so a partition of
    large blobs never materializes fully in one Python list; repartitioning
    should target ``batch_budget_bytes`` per partition upstream (use
    ``repartition_by_bytes``).
    """
    backend = backend or DecodeBackend()

    fkind = backend.feature_kind

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, sizes, kinds = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    hashes.append(None)
                    sizes.append(None)
                    kinds.append(None)
                    continue
                hashes.append(hashlib.sha256(payload).hexdigest())
                sizes.append(len(payload))
                v = backend.decode_features(payload)
                feats.append(None if v is None else v.tolist())
                kinds.append(None if v is None else fkind)
            yield pd.DataFrame(
                {
                    "doc_url": pdf["doc_url"],
                    "kind": pdf["kind"],
                    "payload_sha256": hashes,
                    "payload_bytes": sizes,
                    "feature": feats,
                    "feature_kind": kinds,
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def repartition_by_bytes(
    media: DataFrame, target_bytes: int = 64 << 20, size_col_expr=None
) -> DataFrame:
    """Repartition a blob table so each partition holds ~target_bytes of
    payload — the knob that keeps Arrow batches memory-safe for media."""
    sized = media.withColumn("_sz", size_col_expr or F.length("payload"))
    total = sized.agg(F.coalesce(F.sum("_sz"), F.lit(0))).collect()[0][0]
    n = max(1, int(total / target_bytes) + 1)
    return sized.repartition(n).drop("_sz")


def exact_media_dedup(features: DataFrame) -> DataFrame:
    """Byte-identical media dedup via content hash (same star-edge shape as
    text exact dedup)."""
    hubs = features.groupBy("payload_sha256").agg(
        F.min("doc_url").alias("hub"), F.count("*").alias("n")
    )
    return (
        features.join(hubs.where(F.col("n") > 1), "payload_sha256")
        .where(F.col("doc_url") != F.col("hub"))
        .select(
            F.col("hub").alias("src"),
            F.col("doc_url").alias("dst"),
            F.lit("media_exact").alias("method"),
        )
    )


def synthesize_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from a docs table — payload =
    utf-8 of text (stand-in for encoded bytes), meta filled with plausible
    values. Lets every media operator be exercised without codec libs."""
    return docs.select(
        F.col("url").alias("doc_url"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
