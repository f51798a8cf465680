"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.5 — its ".stream" procedures
return rows, they are not stream processing). This module adds the
Spark-native streaming path a web-scale ingest pipeline needs: windowed
aggregation with watermarked late-data handling over an events source,
runnable as a real ``readStream`` or smoke-tested from a bounded parquet
directory with a memory sink.
"""

from neo4j_graph_algorithms_spark.streaming.events import (
    windowed_event_counts,
    run_stream_once,
)

__all__ = ["windowed_event_counts", "run_stream_once"]
