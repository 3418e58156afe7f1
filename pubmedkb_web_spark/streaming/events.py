"""Streaming analytics over the events table shape
(event_id, ts, user_id, event_type, value, props).

Batch/stream parity: each transformation takes a DataFrame that may be a
static read OR a readStream — the logical plan is identical (that's the
point of Structured Streaming). Tests drive them with a parquet readStream
+ memory sink + processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path_glob: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_DDL).parquet(path_glob)


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sums per event_type, late data beyond
    the watermark dropped."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete") -> None:
    """Drive a streaming query to completion synchronously (test harness).

    Default output mode is ``complete``: with availableNow + a finite input
    the watermark never passes the last window, so ``append`` would emit
    nothing for windowed aggregations — the standard finite-input pitfall.
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
