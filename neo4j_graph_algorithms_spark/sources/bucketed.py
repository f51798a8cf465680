"""Bucketed edge-table source/sink — cross-JOB co-location.

The in-session scale contract pre-partitions + pre-sorts the edge side
once per run (operators/pagerank.py plan_side) so no superstep shuffles
the |E|-sized table. That layout dies with the session. At 10^12 edges
the shuffle+sort it replaces is itself a multi-hour job, and a link-graph
warehouse runs MANY algorithms over the SAME edge table — so the layout
belongs in storage: write the table ONCE with ``bucketBy(n, "src")`` +
``sortBy("src")``, and every later run (PageRank, WCC, degree, label
propagation — anything joining or aggregating on ``src``) reads it back
exchange-free and sort-free. The reference's analogue is its packed
on-disk adjacency (HugeAdjacencyList, core/.../huge/HugeAdjacencyList
.java:27-59): a one-time layout cost amortized over every algorithm run.

Mechanics: Spark records bucket spec in the catalog; a scan of the table
reports ``HashPartitioning(src, n_buckets)``, so Catalyst drops the
Exchange (and, with one file per bucket, the Sort) on that side of any
src-keyed sort-merge join or aggregation. The writer repartitions to
exactly one file per bucket — with several files per bucket Spark keeps
the bucket pruning but re-sorts each partition at read time.

Iceberg note (the production target, sources/iceberg.py): Iceberg's
equivalent is a bucket partition transform + sorted write; this module
uses the built-in session-catalog bucketing so the contract is testable
in-sandbox with identical plan shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_edges_bucketed", "read_edges_bucketed"]


def write_edges_bucketed(
    edges: DataFrame,
    table_name: str,
    *,
    n_buckets: int,
    key: str = "src",
    path: str | None = None,
    mode: str = "overwrite",
    symmetrize: bool = False,
) -> None:
    """Materialize ``edges`` as a parquet table bucketed + sorted on
    ``key``. One shuffle now, zero edge-side shuffles in every
    downstream run. ``path`` makes it an external table (the 100-TB
    case: data lives on the lake, only metadata in the catalog).

    ``symmetrize`` stores the UNDIRECTED view (each edge also reversed,
    self-loops dropped, deduplicated) — the layout WCC / label
    propagation consume. Symmetrizing at read time would destroy the
    bucket partitioning (the reversed half is keyed by the other
    endpoint), so an undirected-consumer table must be written this way."""
    if symmetrize:
        from pyspark.sql import functions as F

        e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
        edges = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])
    writer = (
        edges.repartition(n_buckets, key)  # exactly one file per bucket
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_edges_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read the bucketed table. The returned DataFrame carries the
    bucket layout (HashPartitioning on the bucket key) — pass it to
    ``pagerank(..., edges_prelayout=True)`` (or any src-keyed join /
    groupBy) and the plan runs with no Exchange on the edge side."""
    return spark.table(table_name)
