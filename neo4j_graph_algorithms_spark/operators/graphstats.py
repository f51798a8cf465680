"""Whole-graph summary statistics: degree histogram, reciprocity,
degree assortativity.

The descriptive metrics a crawl operator reads before running anything
heavier (is the graph power-law? how reciprocal? hub-to-hub or
hub-to-leaf?). The reference exposes only per-graph counts via
``algo.graph.info`` (GraphInfoProc); these are engine extensions of
that surface computed the aggregation-only way:

- **degree_histogram**: log2-bucketed out/in-degree counts — two
  degree aggregations + one bucket aggregation, output is
  O(log max_degree) rows.
- **reciprocity**: fraction of directed edges whose reverse edge
  exists — ONE left-semi self-join on the deduplicated edge table
  (semi-join, so Catalyst never materializes the pair product).
- **degree_assortativity**: Pearson correlation of (out-degree(src),
  in-degree(dst)) over edges — two vertex-sized degree joins onto the
  edge table, then a single pass of sufficient statistics (the same
  Σx/Σy/Σxy/Σx²/Σy² pattern as pipeline/pca.py), all in one
  ``agg``. No windows, no collects beyond the scalar row.

Everything is exact integer/float arithmetic over sums, so the DuckDB
oracle replays it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["degree_histogram", "graph_summary"]


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(direction, bucket, n_nodes): log2 buckets of out- and in-degree
    (bucket = floor(log2(degree)); degree ≥ 1 by construction — nodes
    with no edges in that direction simply don't appear).

    The bucket is computed EXACTLY as ``length(bin(deg)) − 1`` (binary
    digit count), not via float ``log2`` — ``log(x)/log(2)`` lands a
    hair under an integer for some inputs and the floor flips a bucket,
    engine-dependently."""
    out = []
    for direction, key in (("out", "src"), ("in", "dst")):
        deg = edges.groupBy(F.col(key).alias("id")) \
            .agg(F.count(F.lit(1)).alias("deg"))
        out.append(
            deg.select(
                F.lit(direction).alias("direction"),
                (F.length(F.bin("deg")) - 1).cast("long").alias("bucket"),
            )
            .groupBy("direction", "bucket")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
        )
    return out[0].unionByName(out[1])


def graph_summary(edges: DataFrame) -> DataFrame:
    """One row: (n_nodes, n_edges, reciprocity, assortativity).

    ``edges`` is deduplicated first (self-loops dropped for
    reciprocity/assortativity, per the usual definitions).
    Assortativity is the Pearson correlation of (out-deg(src),
    in-deg(dst)) across directed edges; NaN (constant degree) is
    surfaced as NULL.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")) \
        .distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_edges = e.count()
    n_nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id"))).distinct().count()
    )
    n_recip = e.join(rev, ["src", "dst"], "leftsemi").count()

    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("_x"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("_y"))
    # sums cast to DOUBLE before the products: long×long overflows at
    # web scale, and the oracle (whose integer sums widen to INT128)
    # must share the exact IEEE arithmetic
    stats = (
        e.join(outd, "src").join(ind, "dst")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("_x").cast("double").alias("sx"),
            F.sum("_y").cast("double").alias("sy"),
            F.sum(F.col("_x") * F.col("_y")).cast("double").alias("sxy"),
            F.sum(F.col("_x") * F.col("_x")).cast("double").alias("sxx"),
            F.sum(F.col("_y") * F.col("_y")).cast("double").alias("syy"),
        )
        .select(
            ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
             )).alias("assortativity")
        )
    )
    spark = edges.sparkSession
    base = spark.createDataFrame(
        [(int(n_nodes), int(n_edges),
          float(n_recip) / n_edges if n_edges else 0.0)],
        "n_nodes long, n_edges long, reciprocity double",
    )
    return base.crossJoin(stats)
