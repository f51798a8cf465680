"""Random projection (Johnson–Lindenstrauss) over embedding columns.

The cheap companion to ``pipeline/pca.py``: PCA needs a covariance
pass + eigendecomposition; a JL sketch needs NO data pass at all — a
deterministic ±1 Rademacher matrix (Achlioptas 2003, "Database-friendly
random projections") preserves pairwise distances within 1±ε at
``k = O(log n / ε²)`` output dims. Standard pre-step for the ANN /
near-dup stack in ``pipeline/ann.py``: project 1000-d embeddings to
64-d before bucketing and the LSH joins move 16× fewer bytes.

Determinism contract: sign(d, k) = lowest bit of splitmix64
(``d·out_dim + k``, xor seed-mix) — a pure function of the matrix
coordinates, reproducible on any engine with 64-bit integer ops. The
DuckDB oracle (__spark_entry__._random_projection_sql) regenerates the
IDENTICAL matrix from the same arithmetic; no matrix is shipped or
stored.

Plan shape at 100 TB: the matrix is model-sized (in_dim × out_dim
literals folded into the plan as constants) so the whole operator is
MAP-ONLY — one projected scan, no shuffle, no Python; each output
coordinate is a codegen'd ``aggregate(zip_with(vec, consts, *), +)``
fold over the input vector. At very large in_dim × out_dim, plan-as-
constants stops scaling (Catalyst expression-tree size) — switch to a
broadcast matrix + one Arrow ``mapInPandas`` matmul kernel; the
threshold is documented, not silently crossed (ValueError at
``in_dim * out_dim > 65536``).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

__all__ = ["rademacher_signs", "random_project"]

_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB
_MASK = 0xFFFFFFFFFFFFFFFF


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(_C1)) & np.uint64(_MASK)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(_C2)) & np.uint64(_MASK)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(_C3)) & np.uint64(_MASK)
    return x ^ (x >> np.uint64(31))


def rademacher_signs(in_dim: int, out_dim: int, seed: int) -> np.ndarray:
    """(in_dim, out_dim) matrix of ±1: lowest bit of
    splitmix64(d·out_dim + k XOR mix(seed))."""
    d = np.arange(in_dim, dtype=np.uint64)[:, None]
    k = np.arange(out_dim, dtype=np.uint64)[None, :]
    base = (d * np.uint64(out_dim) + k) ^ _mix64(
        np.uint64(seed) * np.ones(1, dtype=np.uint64))
    bits = _mix64(base & np.uint64(_MASK)) & np.uint64(1)
    return np.where(bits == 1, 1.0, -1.0)


def random_project(
    emb: DataFrame,
    *,
    out_dim: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    in_dim: int | None = None,
) -> DataFrame:
    """All input columns plus ``projected`` (array<double>, length
    ``out_dim``): ``x · R / sqrt(out_dim)`` with the deterministic
    Rademacher matrix of :func:`rademacher_signs`."""
    if in_dim is None:
        from neo4j_graph_algorithms_spark.pipeline.ann import (
            _embedding_dim,
        )

        in_dim = _embedding_dim(emb, vec_col)
    if in_dim is None:
        raise ValueError("cannot infer embedding dim; pass in_dim")
    if in_dim * out_dim > 65536:
        raise ValueError(
            f"{in_dim}x{out_dim} projection exceeds the plan-as-constants "
            "threshold (65536); use a broadcast matrix + mapInPandas "
            "matmul kernel instead")
    signs = rademacher_signs(in_dim, out_dim, seed)
    scale = 1.0 / float(np.sqrt(out_dim))
    vec = F.col(vec_col)
    outs = []
    for k in range(out_dim):
        col_k = F.array(*[F.lit(float(s)) for s in signs[:, k]])
        outs.append(
            F.aggregate(
                F.zip_with(vec, col_k,
                           lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ) * F.lit(scale)
        )
    return emb.withColumn("projected", F.array(*outs))
