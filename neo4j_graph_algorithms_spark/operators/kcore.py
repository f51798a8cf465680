"""k-core decomposition by distributed iterative peeling.

The reference has no core-decomposition procedure (its community surface
stops at unionFind/louvain/triangles — algo/src/main/java/org/neo4j/
graphalgo has no KCoreProc), but k-cores are a canonical link-graph
analysis (dense-subgraph extraction, crawl-frontier prioritization,
spam-farm detection), so the engine ships it as an extension alongside
HyperBall.

Semantics (undirected): the k-core is the maximal subgraph where every
vertex has degree >= k within the subgraph; coreness(v) is the largest k
whose k-core contains v. Both are computed by peeling — repeatedly
deleting vertices of degree < k — which is a pure fixpoint of monotone
set shrinkage, so the DataFrame restatement is the same superstep shape
as WCC: per round, one degree aggregation over the surviving edge set
and one semi-join filter. No UDFs, no driver state beyond the round
counter and a changed-count.

Scale shape: the edge table is symmetrized once and re-filtered per
round via vertex-sized semi-joins (broadcast-able below the loop-conf
threshold); degrees are a map-side-combinable groupBy. Rounds needed =
the graph's degeneracy ordering depth, typically O(10-100) on web
graphs; each round strictly shrinks the vertex set so late rounds are
cheap. ``coreness`` runs the peel once per distinct core level but each
level starts from the previous level's survivors (the (k+1)-core is
inside the k-core), so total work is the sum of shrinking passes — the
standard distributed formulation (Montresor et al., "Distributed k-Core
Decomposition", IEEE TPDS 2013 restate it vertex-centrically; this is
the synchronous peel).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.loop_conf import superstep_conf

__all__ = ["k_core", "coreness", "KCoreResult"]


@dataclass
class KCoreResult:
    members: DataFrame  # (id) — vertices of the k-core
    rounds: int
    converged: bool
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _sym_edges(edges: DataFrame) -> DataFrame:
    """Undirected deduplicated adjacency pairs (u, v), no self loops."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(e.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .dropDuplicates(["u", "v"])
    )


def k_core(
    vertices: DataFrame,
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int | None = None,
    spark: SparkSession | None = None,
) -> KCoreResult:
    """Vertices of the k-core (maximal subgraph with min degree >= k).

    ``max_rounds`` bounds the peel (None = run to the fixpoint). With a
    bound the result is the round-``max_rounds`` peel state — a superset
    of the true k-core — which is deterministic and therefore
    SQL-replayable round by round (the driver oracle unrolls it).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = spark or vertices.sparkSession

    sym = _sym_edges(edges)
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = sym.repartition(shuffle_n, "u").sortWithinPartitions("u").persist()
    sym.count()

    # survivors start as all vertices; edges are re-filtered against the
    # survivor set per round (both endpoints must survive)
    alive = vertices.select("id").localCheckpoint(eager=True)
    n_alive = alive.count()
    rounds = 0
    converged = False
    metrics: list[dict[str, Any]] = []

    with superstep_conf(spark, n_alive):
        while max_rounds is None or rounds < max_rounds:
            deg = (
                sym.join(alive.withColumnRenamed("id", "u"), "u", "leftsemi")
                .join(alive.withColumnRenamed("id", "v"), "v", "leftsemi")
                .groupBy("u")
                .agg(F.count(F.lit(1)).alias("_deg"))
            )
            nxt = (
                alive.join(deg.withColumnRenamed("u", "id"), "id", "left")
                .filter(F.coalesce(F.col("_deg"), F.lit(0)) >= k)
                .select("id")
                .localCheckpoint(eager=True)
            )
            n_next = nxt.count()
            rounds += 1
            metrics.append({"round": rounds, "alive": n_next,
                            "removed": n_alive - n_next})
            if n_next == n_alive:
                converged = True
                alive = nxt
                break
            alive, n_alive = nxt, n_next
            if n_alive == 0:
                converged = True
                break

    sym.unpersist()
    return KCoreResult(alive, rounds, converged, metrics)


def coreness(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_k: int | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """(id, coreness) for every vertex — the largest k whose k-core
    contains the vertex (0 for isolated vertices).

    Level-by-level peel: the (k+1)-core is computed from the k-core's
    survivors, so each level's pass touches a shrinking subgraph. Stops
    when the core empties (or at ``max_k``)."""
    spark = spark or vertices.sparkSession
    out = vertices.select("id", F.lit(0).alias("coreness"))
    survivors = vertices.select("id")
    k = 1
    while max_k is None or k <= max_k:
        res = k_core(survivors, edges, k, spark=spark)
        n = res.members.count()
        if n == 0:
            break
        survivors = res.members
        out = (
            out.join(survivors.withColumn("_in", F.lit(1)), "id", "left")
            .select(
                "id",
                F.when(F.col("_in").isNotNull(), F.lit(k))
                .otherwise(F.col("coreness")).alias("coreness"),
            )
            .localCheckpoint(eager=True)
        )
        k += 1
    return out
