"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which case
a deterministic fake decoder (hash-derived dimensions, CRC checksum) runs so
the Spark-side plumbing — binary schema, Arrow batch shape, mapInPandas UDF
signature, partitioning — is real and tested end-to-end.

Real deployment: replace `_fake_decode` with PIL/torchaudio/ffmpeg calls;
nothing else changes."""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),        # opaque encoded bytes
    StructField("mime", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("crc32", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
])


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decoder: dimensions derived from a
    stable checksum of the payload."""
    c = zlib.crc32(payload)
    return 32 + c % 1024, 32 + (c >> 10) % 1024, 1 + (c >> 20) % 64


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Binary payload -> typed feature row, Arrow-batched. Raises
    NotImplementedError without fake=True (no codecs in this image)."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires PIL/ffmpeg (not in this container); "
            "pass fake=True for the deterministic stub")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                p = bytes(payload or b"")
                w, h, nf = _fake_decode(p)
                rows.append((int(mid), kind, len(p), zlib.crc32(p), w, h,
                             nf if kind == "video" else 1))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FEATURE_SCHEMA.fields])

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def frame_sample(features: DataFrame, every_n: int = 8) -> DataFrame:
    """Deterministic frame subsampling plan for video rows: one output row
    per kept frame index (pure Spark, no decode)."""
    return (features.filter(F.col("kind") == "video")
            .withColumn("frame_idx", F.explode(F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_n))))
            .select("media_id", "frame_idx"))
