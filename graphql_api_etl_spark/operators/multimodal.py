"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

The Spark-side architecture is real and tested — schemas, partition
sizing, Arrow batch flow, UDF signatures. The actual media decode is
STUBBED (this container has no image/audio libraries): pass
``fake=True`` for a deterministic fake feature extractor, or leave the
default and get ``NotImplementedError`` at evaluation time, marking
exactly where a real decoder (PIL/torchaudio/ffmpeg) plugs in.

Scale design: payloads stay in executor memory only one Arrow batch at
a time (``mapInPandas`` is streaming per-batch); metadata-only queries
never touch the payload column thanks to parquet column pruning; and
``repartition`` before heavy decode spreads byte-skew (few huge videos
per partition) ahead of the CPU-bound stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 8

_FEATURES_FIELDS = [
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload_sha256", T.StringType()),
    T.StructField("payload_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
]
FEATURES_SCHEMA = T.StructType(_FEATURES_FIELDS)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter for the test corpus: treat document text bytes as an
    opaque payload so the binary plumbing is exercised end-to-end on
    real rows (the driver ships no true media table)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("bigint").alias("meta_duration_ms"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a media decoder: md5-seeded feature
    vector in [0, 1). Replaces (e.g.) a CNN embedding or mel features."""
    h = hashlib.md5(payload).digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame, fake: bool = False, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract every payload via ``mapInPandas``.

    ``fake=False`` raises ``NotImplementedError`` per batch — the
    marked integration point for a real decoder. The Arrow batch shape
    (pdf of payload bytes in, pdf of feature arrays out) is identical
    either way, so swapping in a real decoder changes no plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires an image/audio library not present in this "
                    "container; use fake=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_sha256": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "payload_bytes": payloads.map(lambda b: len(bytes(b))).astype("int64"),
                    "features": payloads.map(lambda b: _fake_decode(bytes(b))),
                }
            )

    src = media
    if batch_hint:
        src = src.repartition(batch_hint)
    return src.mapInPandas(run, FEATURES_SCHEMA)


def binary_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only pass — native expressions, payload column read but
    never shipped to Python: byte length, sha256, magic prefix."""
    return media.select(
        "media_id",
        "media_type",
        F.octet_length(F.col("payload")).alias("payload_bytes"),
        F.lower(F.sha2(F.col("payload"), 256)).alias("payload_sha256"),
        F.lower(F.substring(F.hex(F.col("payload")), 1, 8)).alias("magic"),
    )
