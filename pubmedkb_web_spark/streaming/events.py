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


# ---- gap sessionization: batch twin + custom stateful streaming operator ----

SESSION_DDL = (
    "user_id long, session_start long, session_end long, n_events long"
)
_SESSION_STATE_DDL = "sess_start long, last_ts long, n long"


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """One row per (user, session): sessions split on > ``gap_s`` idle
    gaps (same rule as the reference-shaped sessionize_users rollup).
    Timestamps are emitted as epoch seconds so the batch and streaming
    twins compare exactly (no tz round-trip through pandas)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ -> TIMESTAMP (session tz, UTC) first: Spark 4 refuses a direct
    # TIMESTAMP_NTZ -> BIGINT cast
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    return (
        events.withColumn("_new", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0))
        .withColumn("_sess", F.sum("_new").over(w))
        .groupBy("user_id", "_sess")
        .agg(
            F.min(epoch).alias("session_start"),
            F.max(epoch).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    session assembly. State carries the OPEN session (start, last event
    ts, count); a batch's events are folded in event-time order and every
    session CLOSED by a subsequent > ``gap_s`` gap is emitted. Sessions
    still open when the input ends stay in state (unemitted) — the
    standard append-mode contract; the parity test compares against
    sessionize_batch minus each user's last session.

    State is a 3-long scalar per user — millions of concurrent users fit
    comfortably in the state store at 100 TB event volumes, and the
    per-batch Python work is one Arrow batch per user group.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key: tuple, pdfs, state: GroupState):
        user_id = int(key[0])
        ts_all: list[int] = []
        for pdf in pdfs:
            # int64 ns -> epoch seconds; arrives tz-naive UTC from Spark
            ts_all.extend(int(v) // 1_000_000_000 for v in pdf["ts"].astype("int64"))
        ts_all.sort()
        if state.exists:
            sess_start, last_ts, n = state.get
        else:
            sess_start = last_ts = None
            n = 0
        closed: list[tuple[int, int, int, int]] = []
        for t in ts_all:
            if last_ts is None:
                sess_start, last_ts, n = t, t, 1
            elif t - last_ts > gap_s:
                closed.append((user_id, sess_start, last_ts, n))
                sess_start, last_ts, n = t, t, 1
            else:
                # max(): events are expected in order (sorted per batch,
                # batches in source order); if a late straggler slips in
                # below the open session's head, never regress the state
                last_ts, n = max(last_ts, t), n + 1
        state.update((sess_start, last_ts, n))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_DDL,
        stateStructType=_SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
