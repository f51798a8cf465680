"""Densest subgraph by (1+ε)-approximate greedy peeling.

Bahmani, Kumar & Vassilvitskii, "Densest Subgraph in Streaming and
MapReduce" (VLDB 2012): repeatedly delete every vertex whose degree is
≤ 2(1+ε)·ρ where ρ = |E|/|V| is the current density, and return the
densest intermediate subgraph seen — a (2+2ε)-approximation of the
densest subgraph in O(log₁₊ε n) rounds. The canonical MapReduce-era
dense-cluster extractor on web graphs (link farms, communities), a
natural companion to k-core/k-truss; the reference has no equivalent.

Every round removes at least one vertex (the threshold exceeds the
average degree 2ρ, and some vertex is at or below average), so the
peel terminates without a round bound; ``max_rounds`` bounds it anyway
to make the depth deterministic for the SQL oracle (the k-truss /
k-core pattern — the tracked best is identical once the peel empties
within the bound).

Scale shape per round (same as k-core): one count of surviving
canonical edges, one degree aggregation with map-side combine, one
vertex-sized semi-join filter. Driver state: the (m, n) pair per round
and the best round's alive snapshot (a checkpointed vertex-sized
DataFrame reference, not collected rows).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.loop_conf import superstep_conf

__all__ = ["densest_subgraph", "DensestResult"]


@dataclass
class DensestResult:
    members: DataFrame  # (id, density) — vertices of the best round
    density: float
    rounds: int
    metrics: list[dict[str, Any]] = field(default_factory=list)


def densest_subgraph(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    epsilon: float = 0.5,
    max_rounds: int | None = None,
    spark: SparkSession | None = None,
) -> DensestResult:
    """Vertex set of the densest intermediate subgraph of the
    (1+ε)-greedy peel, with its density ρ = |E|/|V| (undirected simple
    edges). Ties across rounds go to the EARLIEST round — deterministic
    and SQL-replayable."""
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    spark = spark or vertices.sparkSession
    ce = (
        edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )
    alive = vertices.select("id").localCheckpoint(eager=True)
    n = alive.count()
    best_alive, best_rho, best_round = alive, -1.0, -1
    rounds = 0
    metrics: list[dict[str, Any]] = []
    with superstep_conf(spark, n):
        while n > 0 and (max_rounds is None or rounds < max_rounds):
            surv = (
                ce.join(alive.withColumnRenamed("id", "a"), "a", "leftsemi")
                .join(alive.withColumnRenamed("id", "b"), "b", "leftsemi")
            )
            m = surv.count()
            rho = m / n
            metrics.append({"round": rounds, "n": n, "m": m, "rho": rho})
            if rho > best_rho:
                best_alive, best_rho, best_round = alive, rho, rounds
            threshold = 2.0 * (1.0 + epsilon) * rho
            deg = (
                surv.select(F.col("a").alias("id"))
                .unionAll(surv.select(F.col("b").alias("id")))
                .groupBy("id").agg(F.count(F.lit(1)).alias("_deg"))
            )
            alive = (
                alive.join(deg, "id", "left")
                .filter(F.coalesce(F.col("_deg"), F.lit(0)) > threshold)
                .select("id")
                .localCheckpoint(eager=True)
            )
            n = alive.count()
            rounds += 1
    members = best_alive.select(
        "id", F.round(F.lit(best_rho), 6).alias("density"))
    return DensestResult(members, best_rho, rounds, metrics)
