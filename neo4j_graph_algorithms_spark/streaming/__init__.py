"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.5 — its ".stream" procedures
return rows, they are not stream processing). This module adds the
Spark-native streaming path a web-scale ingest pipeline needs:

- ``events``: windowed aggregation with watermarked late-data handling
  over an events source, plus a custom stateful sessionizer
  (``applyInPandasWithState``), runnable as a real ``readStream`` or
  smoke-tested from a bounded parquet directory with a memory sink.
- ``graph_maintenance``: continuously-maintained WCC labels / PageRank /
  triangle counts over a stream of crawl edge-delta micro-batches —
  ``foreachBatch`` folds of the batch engine's incremental operators
  with durable per-batch state + lineage metrics and replay-safe
  commits.
"""

from neo4j_graph_algorithms_spark.streaming.events import (
    windowed_event_counts,
    run_stream_once,
)
from neo4j_graph_algorithms_spark.streaming.graph_maintenance import (
    run_component_maintenance,
    run_labelprop_maintenance,
    run_pagerank_maintenance,
    run_triangle_maintenance,
)
from neo4j_graph_algorithms_spark.streaming.dedup import (
    run_dedup_maintenance,
    run_near_dup_maintenance,
)

__all__ = [
    "windowed_event_counts",
    "run_stream_once",
    "run_component_maintenance",
    "run_labelprop_maintenance",
    "run_pagerank_maintenance",
    "run_triangle_maintenance",
    "run_dedup_maintenance",
    "run_near_dup_maintenance",
]
