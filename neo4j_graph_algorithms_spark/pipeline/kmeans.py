"""DataFrame-native Lloyd's k-means over an embedding column, and the
semantic-dedup operator built on it.

Why it exists: :func:`..pipeline.ann.ivf_knn` coarse-quantizes with a
deterministic sample and notes that "a production run would plug in
sampled k-means centroids" — this module is that plug. It also powers
semantic deduplication (keep one survivor per embedding cluster), the
embedding-space counterpart of the MinHash/SimHash near-dup family in
``pipeline/dedup.py``.

The 100-TB shape (what each phase costs at scale):

- **Model state is driver-sized, data never is.** The centroid table is
  k × d floats (a few MB even at k=65536, d=1024) held as a Python list
  and re-broadcast each iteration as a literal single-row array column
  — the same pattern ivf_knn uses. The corpus is only ever streamed.
- **Assignment is map-only.** Each row folds over the broadcast
  centroid array with a JVM higher-order ``aggregate`` (argmin of
  squared euclidean distance, ties to the smaller centroid id) — no
  shuffle, no corpus × k row blowup, no Python.
- **The update is ONE shuffle of k·d·partitions rows.** ``posexplode``
  turns each vector into d (cell, pos, val) rows, but hash aggregation
  is partial: every task pre-reduces to ≤ k·d rows before the exchange,
  so shuffle volume is independent of corpus size. The per-iteration
  ``collect()`` moves exactly k·d averaged values (model-sized, like
  the reference's own sequential driver phases, e.g.
  algo/.../impl/louvain/Louvain.java's per-level driver loop).
- **Cross-engine determinism.** Init = the k corpus vectors with the
  smallest ``md5(id)`` (same rule as ivf_knn's sample, so the DuckDB
  oracle replays it verbatim); centroid means are rounded to 9 dp at
  each iteration boundary, so the two engines' independently-summed
  averages (|error| ~1e-14) collapse to identical literals before the
  next assignment — assignments then match exactly except for points
  equidistant to 1e-8 between two centroids, which don't occur in
  non-degenerate float data.

Reference parity: the reference has no k-means (its similarity family
stops at scored pairs, algo/similarity/*); this is a pipeline extension
in the spirit of its ANN/dedup mandate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from neo4j_graph_algorithms_spark.pipeline.ann import _as_double

__all__ = ["KMeansResult", "kmeans_fit", "semantic_dedup"]


@dataclass
class KMeansResult:
    assignments: DataFrame  # (id, cluster, dist2)
    centroids: list[list[float]]  # k rows, index == cluster id
    iterations: int


def _centroid_literal(spark, cents: list[list[float]]) -> DataFrame:
    """One-row DataFrame holding the whole model as an array of structs
    (cid, cv) — broadcast into every assignment task as a literal."""
    return spark.createDataFrame(
        [([(i, [float(x) for x in c]) for i, c in enumerate(cents)],)],
        "cents array<struct<cid:bigint,cv:array<double>>>",
    )


def _assign(base: DataFrame, cdf: DataFrame) -> DataFrame:
    """(id, v) → (id, v, cluster, dist2) via a narrow argmin fold.

    dist2 = Σ (x−y)² folded left-to-right (zip_with + aggregate), the
    bit-level mirror of the oracle's ``list_distance`` comparator
    (sqrt is monotone, so the argmin and all tie decisions agree)."""
    init = F.struct(
        F.lit(float("inf")).alias("d2"), F.lit(-1).cast("long").alias("cid")
    )

    def _d2(c: Column) -> Column:
        return F.aggregate(
            F.zip_with(F.col("v"), c["cv"], lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def _step(acc: Column, c: Column) -> Column:
        d2 = _d2(c)
        better = (d2 < acc["d2"]) | (
            (d2 == acc["d2"]) & (c["cid"] < acc["cid"])
        )
        return F.when(
            better, F.struct(d2.alias("d2"), c["cid"].alias("cid"))
        ).otherwise(acc)

    best = F.aggregate("cents", init, _step)
    return base.crossJoin(F.broadcast(cdf)).select(
        "id", "v", best["cid"].alias("cluster"), best["d2"].alias("dist2")
    )


def kmeans_fit(
    emb: DataFrame,
    *,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_centroids: list[list[float]] | None = None,
) -> KMeansResult:
    """Lloyd's k-means: ``iterations`` (assign → mean-update) rounds
    from the deterministic md5-sample init, then one final assignment
    against the converged centroids (so labels are consistent with the
    returned model). Empty clusters keep their previous centroid.

    ``init_centroids`` overrides the md5 init (used by ivf_knn's
    refinement path, which seeds with its own sample).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    spark = emb.sparkSession
    base = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )

    if init_centroids is not None:
        cents = [[float(x) for x in c] for c in init_centroids]
        if len(cents) != k:
            raise ValueError(f"init_centroids has {len(cents)} rows, k={k}")
    else:
        # k smallest md5(id): orderBy+limit is TakeOrderedAndProject —
        # per-partition top-k merged on the driver; k rows collected
        rows = (
            base.withColumn("_m", F.md5(F.col("id").cast("string")))
            .orderBy(F.asc("_m"), F.asc("id"))
            .limit(k)
            .select("v")
            .collect()
        )
        if len(rows) < k:
            raise ValueError(f"corpus has {len(rows)} rows < k={k}")
        cents = [[float(x) for x in r["v"]] for r in rows]

    for _ in range(iterations):
        assigned = _assign(base, _centroid_literal(spark, cents))
        # partial-aggregated mean per (cluster, dim): ≤ k·d rows leave
        # each task; exactly k·d rows reach the driver (model-sized)
        mean_rows = (
            assigned.select(
                "cluster", F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 9).alias("mu"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cell.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(
                r["mu"]
            )
        cents = [
            [by_cell[c][p] for p in range(len(cents[c]))]
            if c in by_cell
            else cents[c]  # empty cluster: keep previous centroid
            for c in range(k)
        ]

    final = _assign(base, _centroid_literal(spark, cents)).select(
        "id", "cluster", "dist2"
    )
    return KMeansResult(final, cents, iterations)


def semantic_dedup(
    emb: DataFrame,
    *,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space dedup: cluster with k-means, keep ONE survivor
    per cluster — the member nearest its centroid (ties to the smaller
    id). Returns (cluster, survivor_id, size).

    The companion of ``dedup.dedup_clusters`` (LSH text near-dup →
    survivor per component) for the embedding modality: at 100 TB the
    only data-sized stages are k-means' map-only assignments and one
    window over (cluster) — never a pairwise join."""
    res = kmeans_fit(
        emb, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    )
    w = W.partitionBy("cluster").orderBy(F.asc("dist2"), F.asc("id"))
    return (
        res.assignments.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "size", F.count("*").over(W.partitionBy("cluster"))
        )
        .filter(F.col("_rn") == 1)
        .select(
            "cluster",
            F.col("id").alias("survivor_id"),
            F.col("size").cast("long").alias("size"),
        )
    )
