"""Structured-Streaming front-end: incremental transcript ingestion.

QSE itself is stream-at-a-time over a file (`Parser.java:103-105`); the
Spark-native equivalent of "keep statistics as triples arrive" is a
streaming extraction + windowed/stateful aggregation:

  readStream(transcripts) -> mapInPandas extraction (same vectorized UDF as
  batch) -> watermarked windowed aggregates or complete-mode class counts.

The stats kernel's aggregations are algebraic (see stats.py), so streaming
partial aggregation is semantically identical to the batch kernel — the
batch/stream parity test (tests/test_sources_streaming.py) asserts it."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import TYPE_PREDICATE
from ..operators.extraction import (TRIPLE_SCHEMA, _normalize_triples,
                                    _raw_iter)

TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp")


def streaming_extract(spark: SparkSession, path: str,
                      max_files: int = 4) -> DataFrame:
    """Streaming triples from a growing directory of transcript parquet —
    the same Arrow extraction UDF + JVM normalize projection as batch."""
    stream = (spark.readStream.schema(TRANSCRIPT_DDL)
              .option("maxFilesPerTrigger", max_files)
              .parquet(path))
    return _normalize_triples(
        stream.select("conv_id", "turn_idx", "text")
        .mapInArrow(_raw_iter, TRIPLE_SCHEMA),
        lead=("conv_id", "turn_idx"))


def streaming_class_counts(triples: DataFrame,
                           type_predicate: str = TYPE_PREDICATE) -> DataFrame:
    """Running classEntityCount (complete-mode aggregate): distinct entities
    per class via approx_count_distinct (streaming cannot hold exact distinct
    state unbounded; the batch kernel stays exact)."""
    return (triples.filter(F.col("predicate") == type_predicate)
            .groupBy(F.col("object").alias("class"))
            .agg(F.approx_count_distinct("subject").alias("class_count")))
