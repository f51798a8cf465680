"""Link-prediction scores — ``algo.linkprediction.*`` (reference:
linkprediction/LinkPrediction.java:38-122, NeighborsFinder.java):

- commonNeighbors(u,v)        = |N(u) ∩ N(v)|
- adamicAdar(u,v)             = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w))
- resourceAllocation(u,v)     = Σ_{w ∈ N(u)∩N(v)} 1/deg(w)
  (LinkPrediction.java:57-75)
- preferentialAttachment(u,v) = deg(u) · deg(v)
- totalNeighbors(u,v)         = |N(u) ∪ N(v)|
- sameCommunity(u,v)          = 1.0 iff both carry the community
  property and the values are equal, else 0.0
  (LinkPrediction.java:122-131)

over **undirected** neighborhoods of the deduplicated graph. The
reference evaluates one pair per function call; the Spark restatement is
set-oriented — one job scores a whole pair table via neighbor-index
joins (inverted index meets inverted index on the common neighbor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["link_prediction_for_pairs", "same_community_for_pairs"]


def link_prediction_for_pairs(edges: DataFrame, pairs: DataFrame) -> DataFrame:
    """Score ``pairs(u, v)`` against ``edges(src, dst)``.

    Output: (u, v, common_neighbors, adamic_adar, resource_allocation,
    preferential_attachment, total_neighbors).
    """
    canon = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("lo"),
                F.greatest("src", "dst").alias("hi"))
        .dropDuplicates(["lo", "hi"])
    )
    nbrs = canon.select(F.col("lo").alias("id"), F.col("hi").alias("nbr")).union(
        canon.select(F.col("hi").alias("id"), F.col("lo").alias("nbr"))
    )
    deg = nbrs.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))

    common = (
        pairs.join(nbrs.withColumnRenamed("id", "u"), "u")
        .join(
            nbrs.withColumnRenamed("id", "v").withColumnRenamed("nbr", "nbr2"),
            "v",
        )
        .filter(F.col("nbr") == F.col("nbr2"))
        .select("u", "v", F.col("nbr").alias("w"))
    )
    cn = (
        common.join(deg.withColumnRenamed("id", "w"), "w")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(F.lit(1.0) / F.log(F.col("deg"))).alias("adamic_adar"),
            F.sum(F.lit(1.0) / F.col("deg")).alias("resource_allocation"),
        )
    )
    return (
        pairs.join(deg.withColumnRenamed("id", "u")
                   .withColumnRenamed("deg", "du"), "u", "left")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"),
              "v", "left")
        .join(cn, ["u", "v"], "left")
        .select(
            "u", "v",
            F.coalesce("common_neighbors", F.lit(0)).alias("common_neighbors"),
            F.coalesce("adamic_adar", F.lit(0.0)).alias("adamic_adar"),
            F.coalesce("resource_allocation", F.lit(0.0))
            .alias("resource_allocation"),
            (F.coalesce("du", F.lit(0)) * F.coalesce("dv", F.lit(0))
             ).alias("preferential_attachment"),
            (F.coalesce("du", F.lit(0)) + F.coalesce("dv", F.lit(0))
             - F.coalesce("common_neighbors", F.lit(0))).alias("total_neighbors"),
        )
    )


def same_community_for_pairs(pairs: DataFrame,
                             communities: DataFrame) -> DataFrame:
    """``algo.linkprediction.sameCommunity`` set-oriented
    (LinkPrediction.java:122-131): score 1.0 iff BOTH endpoints carry a
    community value and the values are equal; a missing property on
    either side scores 0.0 (the reference returns 0.0 when
    ``hasProperty`` fails).

    ``communities``: (id, community) — e.g. a Louvain/LPA/WCC output;
    rows may be absent for nodes without the property.
    """
    cu = communities.select(F.col("id").alias("u"),
                            F.col("community").alias("_cu"))
    cv = communities.select(F.col("id").alias("v"),
                            F.col("community").alias("_cv"))
    return (
        pairs.join(cu, "u", "left").join(cv, "v", "left")
        .select(
            "u", "v",
            F.when(F.col("_cu").isNotNull() & F.col("_cv").isNotNull()
                   & (F.col("_cu") == F.col("_cv")), F.lit(1.0))
            .otherwise(F.lit(0.0)).alias("same_community"),
        )
    )
