"""Structured Streaming demo over the ``events`` table (SURVEY §2.9).

The reference has no streaming; this is the additive extension: a
file-source stream → watermark → tumbling-window aggregation →
in-memory/parquet sink, runnable with Trigger.AvailableNow so tests are
deterministic. The batch twin of the same plan backs the DuckDB oracle.

Scale notes: the windowed count is a standard stateful agg — state is
bounded by the watermark horizon; partitioning is by (window, event_type)
after the local partial agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: events.parquet stores ts as INT64 TIMESTAMP(NANOS) — Spark rejects nano
#: timestamps unless spark.sql.legacy.parquet.nanosAsLong=true, which reads
#: them as raw nanosecond longs; `ts div 1000` (exact integer division)
#: recovers microsecond timestamps.
EVENTS_SCHEMA = "event_id long, ts long, user_id long, event_type string, value double, props string"


def read_events(spark: SparkSession, events_path: str) -> DataFrame:
    """Batch events reader with the nano-timestamp workaround."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(events_path).withColumn(
        "ts", F.expr("timestamp_micros(ts div 1000)")
    )


def windowed_counts_batch(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Batch rendering of the tumbling-window aggregate (oracle-friendly:
    window_start = epoch-aligned truncation)."""
    win = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def windowed_counts_stream(
    spark: SparkSession,
    events_path: str,
    *,
    minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream twin: same aggregation with a watermark for late data.
    Run with ``run_available_now`` for a deterministic drain-the-source
    execution."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file-stream source wants a directory; point at the parent and
    # glob-filter to the events file so sibling tables are not picked up
    import os

    if events_path.endswith(".parquet"):
        base, fname = os.path.dirname(events_path), os.path.basename(events_path)
    else:
        base, fname = events_path, "*.parquet"
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", fname)
        .parquet(base)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    win = F.window("ts", f"{minutes} minutes")
    return (
        src.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def run_available_now(stream_df: DataFrame, query_name: str = "events_windowed") -> DataFrame:
    """Execute the streaming plan over all currently-available input
    (Trigger.AvailableNow) into an in-memory sink; returns the result as a
    batch DataFrame. Deterministic: the stream drains and stops."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
