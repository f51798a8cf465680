"""Watermarked windowed aggregation over the events stream.

``windowed_event_counts`` declares the streaming plan (readStream →
watermark → window agg); ``run_stream_once`` drives it synchronously to
completion against a bounded parquet dir using a memory sink — the
local smoke path. On a cluster the same plan runs against a file/Kafka
source with ``writeStream`` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

__all__ = ["windowed_event_counts", "run_stream_once"]

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
