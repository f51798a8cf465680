"""Community refinement: split internally-disconnected communities.

The Leiden guarantee (Traag, Waltman & van Eck, "From Louvain to
Leiden", Sci. Rep. 2019): Louvain-style greedy modularity moves can
leave a community whose induced subgraph is DISCONNECTED — a node acts
as a bridge, moves away, and strands the two halves under one label.
Leiden fixes it with a refinement phase; this operator is that phase as
a standalone pass, applicable to ANY labeling (Louvain levels, label
propagation, InfoMap) produced by the other community operators.

Reference anchor: the reference's Louvain (impl/louvain/Louvain.java)
has no connectivity repair — its tests accept disconnected communities.
This extension upgrades any of its labelings to Leiden's γ-connectivity
guarantee without re-running detection.

Algorithm: one semi-join pass induces the intra-community edge set
(both endpoints share a label), then one WCC over that subgraph
(:func:`~...operators.wcc.connected_components` — partition-local DSS
collapse + min-label pointer jumping) relabels every node by the min
member id of its intra-community component. Nodes with no
intra-community edge become singletons — exactly Leiden's treatment of
stranded vertices.

Scale shape: the induced-edge projection is two vertex-sized hash joins
(label table is |V|, broadcastable per community batch under AQE); the
WCC inherits the production operator's shape (edges shuffled once,
pointer jumping on vertex-sized state). No new primitives, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = ["split_disconnected_communities", "RefinementResult"]


@dataclass
class RefinementResult:
    labels: DataFrame          # (id, community, refined_community)
    wcc_iterations: int
    converged: bool


def split_disconnected_communities(
    labels: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    community_col: str = "community",
) -> RefinementResult:
    """``(id, community, refined_community)`` — ``refined_community``
    is the min member id of the node's connected component INSIDE its
    community; a connected community keeps one refined label, a
    disconnected one splits into one label per component. Refined
    labels of different communities never collide (components cannot
    span a community boundary, and min-member ids are unique per
    component)."""
    from neo4j_graph_algorithms_spark.operators.wcc import (
        connected_components,
    )

    lab = labels.select(F.col(id_col).alias("id"),
                        F.col(community_col).alias("community"))
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    la = lab.select(F.col("id").alias("src"), F.col("community").alias("_ca"))
    lb = lab.select(F.col("id").alias("dst"), F.col("community").alias("_cb"))
    intra = (
        e.join(la, "src").join(lb, "dst")
        .where(F.col("_ca") == F.col("_cb"))
        .select("src", "dst")
    )
    res = connected_components(lab.select("id"), intra)
    out = (
        lab.join(res.components, "id")
        .select("id", "community",
                F.col("component").alias("refined_community"))
    )
    return RefinementResult(labels=out, wcc_iterations=res.iterations,
                            converged=res.converged)
