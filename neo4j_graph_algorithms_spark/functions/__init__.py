"""Scalar user functions — the reference's ``@UserFunction`` surface."""

from neo4j_graph_algorithms_spark.functions.scalars import (
    infinity,
    is_finite,
    is_infinite,
    nan,
    one_hot,
    as_path,
    get_nodes_by_id,
)

__all__ = ["infinity", "is_finite", "is_infinite", "nan", "one_hot",
           "as_path", "get_nodes_by_id"]
