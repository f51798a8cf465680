"""Watermarked windowed aggregation + custom stateful operators over
the events stream.

``windowed_event_counts`` declares the streaming plan (readStream →
watermark → window agg); ``run_stream_once`` drives it synchronously to
completion against a bounded parquet dir using a memory sink — the
local smoke path. On a cluster the same plan runs against a file/Kafka
source with ``writeStream`` unchanged.

``stateful_sessionize`` is the CUSTOM stateful operator shape the
built-in window aggregation cannot express — per-user gap-based
sessionization with arbitrary per-group state carried across
micro-batches via ``applyInPandasWithState`` (Arrow-batched; state =
the open session tuple per user; closed sessions stream out as soon as
the gap rule fires). The grouping key partitions state across
executors, so state volume scales horizontally with users.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

__all__ = ["windowed_event_counts", "run_stream_once",
           "stateful_sessionize", "run_stateful_sessions_once"]

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def windowed_event_counts(
    stream: DataFrame,
    *,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """count + sum(value) per (window, event_type), late rows beyond the
    watermark dropped."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n", "sum_value",
        )
    )


def run_stream_once(spark: SparkSession, events_dir: str,
                    query_name: str = "event_counts") -> DataFrame:
    """Drive the streaming plan over a bounded parquet dir; returns the
    completed aggregation as a DataFrame (memory sink)."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(events_dir)
    )
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long"


def stateful_sessionize(stream: DataFrame, *,
                        gap_seconds: int = 1800) -> DataFrame:
    """CLOSED sessions per user: a session ends when the next event is
    more than ``gap_seconds`` after the previous one. The open session
    survives in group state across micro-batches (epoch-second tuple
    (start, last, n)); only closed sessions are emitted, as soon as the
    closing event arrives."""

    def fn(key: Tuple[Any, ...],
           pdfs: Iterable[pd.DataFrame],
           state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        # a group can span MANY Arrow chunks — order is only defined
        # after concatenating and sorting the whole batch's events
        chunks = [pdf["ts"] for pdf in pdfs]
        ts = pd.concat(chunks).sort_values() if chunks else pd.Series([])
        for t in ts:
            sec = int(t.timestamp())
            if start is None:
                start, last, n = sec, sec, 1
            elif sec - last > gap_seconds:
                closed.append((user_id, start, last, n))
                start, last, n = sec, sec, 1
            else:
                # cross-batch late event (sec < last): counted into the
                # open session without regressing its end — assigning
                # late data to already-closed sessions would need a
                # watermark-driven reopen, out of scope here
                last = max(last, sec)
                n += 1
        if start is not None:
            state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="s"),
                    "session_end": pd.to_datetime(
                        [c[2] for c in closed], unit="s"),
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_OUT_SCHEMA, _SESSION_STATE_SCHEMA,
            "update", "NoTimeout",
        )
    )


def run_stateful_sessions_once(spark: SparkSession, events_dir: str,
                               query_name: str = "sessions",
                               gap_seconds: int = 1800) -> DataFrame:
    """Drive the stateful sessionizer over a bounded parquet dir (all
    files land in one micro-batch); returns the closed sessions."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    )
    out = stateful_sessionize(stream, gap_seconds=gap_seconds)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
