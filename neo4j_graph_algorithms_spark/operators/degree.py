"""Degree centrality — ≡ ``algo.degree`` (reference:
algo/.../DegreeCentralityProc.java:60-99; impl
algo/.../impl/degree/DegreeCentrality.java, WeightedDegreeCentrality.java).

The reference computes, per node, the count (or weight sum) of
relationships in the requested direction. Pure one-shuffle hash
aggregation here; every vertex appears in the output (0.0 for isolated
nodes), matching the reference's write-back of a score for every node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["degree_centrality"]


def degree_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    direction: str = "in",
    weighted: bool = False,
) -> DataFrame:
    """(id, score). ``direction`` in {'in','out','both'}; weighted sums
    the ``weight`` column (weights <= 0 excluded, matching
    WeightedDegreeCentrality's positive-weight accumulation)."""
    e = edges
    if weighted:
        e = e.filter(F.col("weight") > 0.0)
    parts = []
    if direction in ("in", "both"):
        parts.append(e.select(F.col("dst").alias("id"),
                              (F.col("weight") if weighted else F.lit(1.0)).alias("w")))
    if direction in ("out", "both"):
        parts.append(e.select(F.col("src").alias("id"),
                              (F.col("weight") if weighted else F.lit(1.0)).alias("w")))
    if not parts:
        raise ValueError(f"bad direction {direction!r}")
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    scores = u.groupBy("id").agg(F.sum("w").alias("score"))
    return (
        vertices.select("id")
        .join(scores, "id", "left")
        .select("id", F.coalesce(F.col("score"), F.lit(0.0)).alias("score"))
    )
