"""Minimum/maximum spanning trees + k-spanning-tree partitioning.

Reference procedures re-expressed (SURVEY.md §2.4):
``algo.mst`` / ``algo.spanningTree[.minimum/.maximum]``
(PrimProc.java:63-103, impl/spanningTrees/Prim.java) and
``algo.spanningTree.k(min|max)`` (KSpanningTreeProc.java:59-74,
impl/spanningTrees/KSpanningTree.java).

The reference grows a single Prim tree from ``startNode`` with a
priority queue — inherently sequential. The distributed restatement is
**Borůvka**: every component picks its lightest outgoing edge, the
picked edges merge components (a WCC pass over the shrunken
component graph), repeat — O(log n) rounds, each round one join + one
min-aggregation. The result is a minimum spanning forest; restricted to
``startNode``'s component it spans exactly the nodes Prim reaches, with
the identical total weight (all minimum spanning trees share total
weight; the edge set matches Prim's whenever weights are distinct — ties
are broken deterministically by (weight, lo, hi)).

``k_spanning_tree``: remove the k-1 heaviest (kmin) or lightest (kmax)
edges of the tree → k clusters, labeled by min member id
(KSpanningTree.java semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W, functions as F

from neo4j_graph_algorithms_spark.operators.wcc import connected_components

__all__ = ["spanning_tree", "k_spanning_tree", "SpanningTreeResult"]


@dataclass
class SpanningTreeResult:
    edges: DataFrame       # (lo, hi, weight) tree edges
    total_weight: float
    node_count: int
    effective_node_count: int


def _canon_weighted(edges: DataFrame, minimum: bool) -> DataFrame:
    """Undirected canonical (lo, hi, weight); parallel edges keep the
    best weight for the objective."""
    agg = F.min("weight") if minimum else F.max("weight")
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            F.col("weight").cast("double").alias("weight"),
        )
        .groupBy("lo", "hi")
        .agg(agg.alias("weight"))
    )


def spanning_tree(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    start_node: int | None = None,
    minimum: bool = True,
    max_rounds: int = 40,
) -> SpanningTreeResult:
    """Borůvka spanning forest; filtered to ``start_node``'s component
    when given (≡ Prim from startNode, Prim.java)."""
    canon = _canon_weighted(edges, minimum).persist()
    canon.count()
    sign = 1.0 if minimum else -1.0
    # order key: deterministic total order on edges
    keyed = canon.select(
        "lo", "hi", "weight",
        F.struct((F.col("weight") * sign).alias("w"),
                 F.col("lo").alias("l"), F.col("hi").alias("h")).alias("_key"),
    )

    comp = vertices.select("id", F.col("id").alias("component"))
    tree = None
    for _ in range(max_rounds):
        lab = comp.select(F.col("id").alias("lo"), F.col("component").alias("_clo"))
        lab2 = comp.select(F.col("id").alias("hi"), F.col("component").alias("_chi"))
        crossing = (
            keyed.join(lab, "lo").join(lab2, "hi")
            .filter(F.col("_clo") != F.col("_chi"))
        ).persist()
        if crossing.isEmpty():
            crossing.unpersist()
            break
        # each component's best outgoing edge (both directions considered)
        cand = crossing.select(F.col("_clo").alias("c"), "_key", "lo", "hi", "weight").union(
            crossing.select(F.col("_chi").alias("c"), "_key", "lo", "hi", "weight")
        )
        best = (
            cand.groupBy("c").agg(F.min("_key").alias("_bk"))
            .join(cand.withColumnRenamed("_key", "_bk"), ["c", "_bk"])
            .select("lo", "hi", "weight")
            .dropDuplicates(["lo", "hi"])
            .localCheckpoint(eager=True)
        )
        crossing.unpersist()
        tree = best if tree is None else tree.union(best).dropDuplicates(
            ["lo", "hi"]).localCheckpoint(eager=True)
        # merge components: WCC over the picked component-graph
        cgraph = (
            best.join(lab, "lo").join(lab2, "hi")
            .select(F.col("_clo").alias("src"), F.col("_chi").alias("dst"))
        )
        cnodes = comp.select(F.col("component").alias("id")).distinct()
        cmap = connected_components(cnodes, cgraph).components
        comp = (
            comp.join(cmap.withColumnRenamed("component", "_new")
                      .withColumnRenamed("id", "component"), "component")
            .select("id", F.col("_new").alias("component"))
            .localCheckpoint(eager=True)
        )

    if tree is None:
        empty = vertices.sparkSession.createDataFrame(
            [], "lo long, hi long, weight double")
        return SpanningTreeResult(empty, 0.0, vertices.count(), 0)

    if start_node is not None:
        target = comp.filter(F.col("id") == start_node).select("component")
        members = comp.join(F.broadcast(target), "component", "left_semi")
        tree = tree.join(
            members.select(F.col("id").alias("lo")), "lo", "left_semi"
        )
        eff = members.count()
    else:
        eff = vertices.count()
    tree = tree.persist()
    tw = tree.agg(F.sum("weight")).first()[0]
    return SpanningTreeResult(
        tree, float(tw or 0.0), vertices.count(), eff
    )


def k_spanning_tree(
    vertices: DataFrame,
    edges: DataFrame,
    k: int,
    *,
    start_node: int | None = None,
    minimum: bool = True,
) -> DataFrame:
    """(id, cluster = min member id): cut the k-1 worst tree edges
    (heaviest for kmin, lightest for kmax — KSpanningTree.java) and
    label the resulting clusters.

    Like the reference's KSpanningTree (which always grows ONE Prim
    tree from ``startNode``), this operates on a single spanning tree:
    when ``start_node`` is None it defaults to the minimum vertex id,
    so cutting k-1 edges yields exactly k clusters on that tree's
    component (a global cut across a spanning FOREST would yield
    components+k-1 clusters on disconnected graphs)."""
    if start_node is None:
        start_node = vertices.agg(F.min("id")).first()[0]
    res = spanning_tree(vertices, edges, start_node=start_node, minimum=minimum)
    sign = -1.0 if minimum else 1.0  # cut heaviest when minimizing
    cut_key = F.struct((F.col("weight") * sign).alias("w"),
                       F.col("lo").alias("l"), F.col("hi").alias("h"))
    # k-1 worst edges via orderBy+limit (TakeOrderedAndProject — a
    # distributed per-partition top-k, not a single-partition window
    # sort of all |V|-1 tree edges), then anti-join them out
    cut = F.broadcast(
        res.edges.orderBy(cut_key).limit(max(k - 1, 0)).select("lo", "hi"))
    kept = res.edges.join(cut, ["lo", "hi"], "left_anti").select(
        F.col("lo").alias("src"), F.col("hi").alias("dst"))
    nodes = (
        res.edges.select(F.col("lo").alias("id"))
        .union(res.edges.select(F.col("hi").alias("id")))
        .union(vertices.sparkSession.createDataFrame(
            [(int(start_node),)], "id long"))  # isolated start component
        .distinct()
    )
    return connected_components(nodes, kept).components.select(
        "id", F.col("component").alias("cluster")
    )
