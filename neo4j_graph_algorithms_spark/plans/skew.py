"""Power-law skew handling: salting and hub-vertex splitting.

Web link graphs are Zipfian: a few hub pages carry millions of edges. In
a shuffle-hash world every edge of a hub lands on one reducer. The
reference's single-JVM answer is degree-balanced partition sizing
(algo/.../impl/pagerank/PageRank.java:86-92,289-317 — partitions bounded
by accumulated out-degree). The distributed equivalents here:

- :func:`split_high_degree` — split vertices with out-degree above a
  threshold into replica sub-vertices; wired into
  :func:`..operators.pagerank.pagerank` via ``hub_threshold`` so a hub's
  edge partition splits into ``hub_replicas`` tasks (the edge cache is
  keyed ``(src, replica)`` and hub ranks are broadcast-expanded to every
  replica each superstep).
- :func:`salted_sum_by_key` — two-level aggregation: salt the key,
  partial-sum per (key, salt), then final-sum per key. NOTE: Spark's
  hash aggregate already does map-side partial combine for ``sum``, so
  after the map side each reduce key receives at most one row per map
  partition — this helper only wins for aggregations WITHOUT partial
  combine (``collect_list``-shaped) or when a straggler reduce task must
  be split further; it is exposed for those cases and unit-tested for
  equivalence.

AQE (``spark.sql.adaptive.skewJoin``) additionally splits skewed join
partitions at runtime; sessions from :mod:`..session` enable it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["salted_sum_by_key", "split_high_degree"]


def salted_sum_by_key(df: DataFrame, key: str, value: str, salt: int,
                      out: str | None = None) -> DataFrame:
    """``df.groupBy(key).sum(value)`` with an explicit two-level salted agg."""
    out = out or value
    if salt <= 1:
        return df.groupBy(key).agg(F.sum(value).alias(out))
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_p"))
    return partial.groupBy(key).agg(F.sum("_p").alias(out))


def split_high_degree(edges: DataFrame, threshold: int, replicas: int) -> DataFrame:
    """Assign a ``replica`` column splitting hub sources into sub-vertices.

    Edges of sources whose out-degree exceeds ``threshold`` are spread
    round-robin-by-hash over ``replicas`` sub-keys; downstream kernels
    partial-aggregate per (src, replica) and combine. Low-degree sources
    keep replica 0, so the common path is unchanged.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    hot: Column = F.col("_deg") > threshold
    return (
        edges.join(deg, "src")
        .withColumn(
            "replica",
            F.when(hot, F.pmod(F.hash("src", "dst"), F.lit(replicas))).otherwise(F.lit(0)),
        )
        .drop("_deg")
    )
