"""PCA over the embedding column: distributed covariance via
per-partition Gram accumulation, driver-side eigendecomposition
(model-sized), map-only projection.

100-TB shape — the one-pass sufficient-statistics pattern:

- **Covariance**: each Arrow batch contributes its d×d Gram block
  ``XᵀX``, its column sum vector, and its row count — accumulated in
  NumPy inside ``mapInPandas`` so a partition of ANY size emits exactly
  d² + d + 1 values. The shuffle that follows is model-sized
  (independent of corpus rows), the classic tree-reduce for second
  moments. cov = (Σxy − Σx·Σy/n)/(n−1) is then column arithmetic.
- **Fit**: the d×d covariance (4096 values at d=64, 1M at d=1024 —
  driver-trivial either way) is collected and ``numpy.linalg.eigh``
  runs on the driver, exactly like the reference's own driver-side
  sequential phases (e.g. Louvain's per-level loop). Component signs
  are canonicalized (largest-|loading| coordinate positive) so results
  are deterministic across LAPACK builds.
- **Project**: the k×d component matrix rides into the executors as a
  broadcast literal; each row's k scores are JVM ``aggregate`` folds
  over ``zip_with`` products — map-only, no shuffle, no Python.

The covariance statistics are exact sums of float64 products, so the
DuckDB oracle recomputes them independently (explode + self-join — fine
at test scale, the point is independence) and matches at 6 dp.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from neo4j_graph_algorithms_spark.pipeline.ann import _as_double

__all__ = ["covariance_matrix", "pca_fit", "pca_project", "PcaModel"]


@dataclass
class PcaModel:
    mean: list[float]
    components: list[list[float]]  # k rows of d loadings
    explained_variance: list[float]


def _moment_rows(emb: DataFrame, vec_col: str) -> DataFrame:
    """(i, j, sxy) Gram entries + (i, -1, sx) column sums + (-1, -1, n):
    every partition emits d²+d+1 rows regardless of its row count."""

    def acc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        sx = None
        n = 0
        for pdf in batches:
            x = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            if x.size == 0:
                continue
            g = x.T @ x
            gram = g if gram is None else gram + g
            s = x.sum(axis=0)
            sx = s if sx is None else sx + s
            n += x.shape[0]
        if gram is None:
            return
        d = gram.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame({
            "i": np.concatenate([ii.ravel(), np.arange(d), [-1]]),
            "j": np.concatenate([jj.ravel(), np.full(d, -1), [-1]]),
            "val": np.concatenate([gram.ravel(), sx, [float(n)]]),
        })

    return (
        emb.select(_as_double(F.col(vec_col)).alias("v"))
        .mapInPandas(acc, "i long, j long, val double")
        .groupBy("i", "j").agg(F.sum("val").alias("val"))
    )


def covariance_matrix(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """(i, j, cov): the d×d sample covariance (denominator n−1) of the
    embedding column, one corpus pass, model-sized shuffle."""
    m = _moment_rows(emb, vec_col)
    n = m.filter((F.col("i") == -1) & (F.col("j") == -1)) \
         .select(F.col("val").alias("n"))
    sums = m.filter((F.col("i") >= 0) & (F.col("j") == -1)) \
            .select(F.col("i").alias("k"), F.col("val").alias("sx"))
    gram = m.filter(F.col("j") >= 0)
    return (
        gram.crossJoin(F.broadcast(n))
        .join(F.broadcast(sums.withColumnRenamed("k", "i")
                          .withColumnRenamed("sx", "_sxi")), "i")
        .join(F.broadcast(sums.withColumnRenamed("k", "j")
                          .withColumnRenamed("sx", "_sxj")), "j")
        .select(
            "i", "j",
            ((F.col("val") - F.col("_sxi") * F.col("_sxj") / F.col("n"))
             / (F.col("n") - 1)).alias("cov"),
        )
    )


def pca_fit(emb: DataFrame, *, k: int = 4,
            vec_col: str = "embedding") -> PcaModel:
    """Top-k principal components from the distributed covariance.

    Deterministic across BLAS/LAPACK builds: eigh of a symmetric
    matrix up to eigenvector SIGN, which is canonicalized so each
    component's largest-|loading| coordinate is positive."""
    # ONE corpus pass: the d²+d+1 moment rows are the model
    stats = {(int(r["i"]), int(r["j"])): float(r["val"])
             for r in _moment_rows(emb, vec_col).collect()}
    d = max(i for i, _ in stats) + 1
    n = stats[(-1, -1)]
    mean = [stats[(i, -1)] / n for i in range(d)]
    cov = np.empty((d, d))
    for i in range(d):
        for j in range(d):
            cov[i, j] = (stats[(i, j)] - stats[(i, -1)] * stats[(j, -1)] / n) \
                / (n - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        c = v[:, idx]
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c = -c
        comps.append([float(x) for x in c])
    return PcaModel(mean=mean, components=comps,
                    explained_variance=[float(w[i]) for i in order])


def pca_project(emb: DataFrame, model: PcaModel, *,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(id, p0..p{k-1}): centered projections onto the model's
    components — broadcast-literal matrix, JVM fold per row, map-only."""
    mean = F.array(*[F.lit(float(x)) for x in model.mean])
    centered = F.zip_with(
        _as_double(F.col(vec_col)), mean, lambda x, m: x - m)

    def dot(c: list[float]) -> Column:
        carr = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(centered, carr, lambda x, y: x * y),
            F.lit(0.0), lambda a, x: a + x,
        )

    return emb.select(
        F.col(id_col).alias("id"),
        *[dot(c).alias(f"p{s}") for s, c in enumerate(model.components)],
    )
