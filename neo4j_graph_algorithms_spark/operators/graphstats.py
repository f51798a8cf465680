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

__all__ = ["degree_histogram", "graph_summary", "powerlaw_fit",
           "diameter_double_sweep"]


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


def powerlaw_fit(edges: DataFrame, *, direction: str = "in",
                 d_min: int = 2) -> DataFrame:
    """(alpha, d_min, n_tail): continuous-MLE power-law exponent of the
    degree distribution (Clauset, Shalizi & Newman, SIAM Review 2009,
    eq. 3.1 with the standard -1/2 continuity correction):

        alpha = 1 + n / Σ_{deg_i >= d_min} ln(deg_i / (d_min - 0.5))

    the first number a crawl operator asks of a new link graph (web
    graphs are famously alpha ≈ 2.1 in-degree). Two aggregations: the
    degree count, then the MLE sums over the degree HISTOGRAM (count ×
    ln per distinct degree — O(max_degree) rows, so the float ln sum
    has bounded, deterministic-scale term count), all JVM expressions.
    """
    if direction not in ("in", "out"):
        raise ValueError("direction must be 'in' or 'out'")
    if d_min < 1:
        raise ValueError("d_min must be >= 1")
    key = "dst" if direction == "in" else "src"
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    deg = e.groupBy(key).agg(F.count(F.lit(1)).alias("deg"))
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("c"))
    tail = hist.filter(F.col("deg") >= d_min)
    return tail.agg(
        (F.lit(1.0) + F.sum("c").cast("double")
         / F.sum(F.col("c") * F.log(F.col("deg") / (d_min - 0.5))))
        .alias("alpha"),
        F.lit(d_min).cast("long").alias("d_min"),
        F.sum("c").cast("long").alias("n_tail"),
    )


def diameter_double_sweep(vertices: DataFrame, edges: DataFrame,
                          *, start_id: int | None = None,
                          max_depth: int = 64) -> DataFrame:
    """(start_id, peripheral_id, lower_bound): exact diameter lower
    bound of the start vertex's undirected component by BFS double
    sweep (Magnien, Latapy & Habib, ACM JEA 2009): BFS from the start,
    take a farthest vertex (ties → smallest id), BFS again from it —
    that eccentricity lower-bounds the diameter, and is exact on trees
    and empirically tight on web graphs. Two BFS runs (the engine's
    level-synchronous frontier kernel), two 1-row driver scalars."""
    from .traversal import bfs_distances

    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = (
        e.union(e.select(F.col("dst"), F.col("src")))
        .toDF("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
    if start_id is None:
        start_id = vertices.agg(F.min("id")).first()[0]
    b1 = bfs_distances(vertices, sym, int(start_id), max_depth=max_depth)
    far = (b1.filter(F.col("distance").isNotNull())
           .orderBy(F.desc("distance"), F.asc("id")).first())
    b2 = bfs_distances(vertices, sym, int(far["id"]), max_depth=max_depth)
    lb = (b2.filter(F.col("distance").isNotNull())
          .agg(F.max("distance")).first()[0])
    spark = vertices.sparkSession
    return spark.createDataFrame(
        [(int(start_id), int(far["id"]), int(lb))],
        "start_id long, peripheral_id long, lower_bound long",
    )
