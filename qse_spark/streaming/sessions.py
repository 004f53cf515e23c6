"""Session windows over the events stream — the native Structured-Streaming
sessionization path next to the batch lag()-based sessionize in
__spark_entry__.py.

`F.session_window(ts, gap)` is Spark's built-in merging session window:
an event owns [ts, ts+gap); overlapping windows of the same group merge.
The SAME aggregation runs in batch (DuckDB-oracled driver row
`events_session_window`) and as a stream (`sessionize_stream`, parity
test in tests/test_sources_streaming.py) — one definition, two execution
modes, which is the point of declaring it rather than hand-rolling state.

Boundary semantics vs the lag() variant: session_window merges on STRICT
overlap, so a follow-up event at exactly `gap` after the previous one
starts a NEW session ([t, t+gap) and [t+gap, ...) do not overlap), while
`lag diff > gap` keeps it in the old one. The oracle SQL mirrors the
strict rule (`diff >= gap` breaks).

At scale: the shuffle key is the group column; state per group is bounded
by the number of OPEN sessions (watermark evicts closed ones), so the
streaming operator's memory is O(active users), not O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value) — one row
    per merged session window; session_end = last event ts + gap."""
    return (events
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sum_value"))


def sessionize_stream(spark: SparkSession, path: str, gap: str = "30 minutes",
                      watermark: str = "1 hour",
                      max_files: int = 4) -> DataFrame:
    """Streaming variant: file-source events + watermark so closed session
    state is evicted; append mode emits a session once the watermark passes
    its end."""
    stream = (spark.readStream.schema(EVENTS_DDL)
              .option("maxFilesPerTrigger", max_files)
              .parquet(path))
    return session_agg(stream.withWatermark("ts", watermark), gap)
