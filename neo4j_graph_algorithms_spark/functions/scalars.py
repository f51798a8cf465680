"""Scalar user functions as Column expressions.

Reference surface (SURVEY.md §2.4):

- ``algo.isFinite / isInfinite / NaN / Infinity``
  (utils/IsFiniteFunc.java:27-45) — float predicates/constants.
- ``algo.ml.oneHotEncoding(available, selected)``
  (ml/OneHotEncoding.java:33) — list → 0/1 vector.
- ``algo.asPath`` (utils/UtilityProc.java:41) — node/cost lists → path
  struct.
- ``algo.getNodeById / asNode(s)`` (GetNodeFunc.java:37-60) — id → node
  row lookup ≡ a join against the vertex table.

All JVM expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["is_finite", "is_infinite", "nan", "infinity", "one_hot",
           "as_path", "get_nodes_by_id"]


def is_finite(col: Column) -> Column:
    return (~F.isnan(col)) & (F.abs(col) != F.lit(float("inf")))


def is_infinite(col: Column) -> Column:
    return F.abs(col) == F.lit(float("inf"))


def nan() -> Column:
    return F.lit(float("nan"))


def infinity() -> Column:
    return F.lit(float("inf"))


def one_hot(available: Column, selected: Column) -> Column:
    """0/1 vector over ``available`` marking membership in ``selected``
    (OneHotEncoding.java semantics: position by the available list)."""
    return F.transform(
        available,
        lambda x: F.when(F.array_contains(selected, x), F.lit(1)).otherwise(F.lit(0)),
    )


def as_path(nodes: Column, costs: Column | None = None) -> Column:
    """Path struct from a node-id list (+ optional per-hop costs)."""
    if costs is None:
        return F.struct(nodes.alias("nodes"))
    return F.struct(nodes.alias("nodes"), costs.alias("costs"),
                    F.aggregate(costs, F.lit(0.0), lambda a, x: a + x)
                    .alias("total_cost"))


def get_nodes_by_id(vertices: DataFrame, ids: list[int]) -> DataFrame:
    """id → node rows (GetNodeFunc ≡ filter/join on the vertex table)."""
    return vertices.filter(F.col("id").isin(ids))
