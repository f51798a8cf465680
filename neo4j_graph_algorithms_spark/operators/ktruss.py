"""k-truss decomposition by distributed edge peeling.

The reference stops at triangle counting (TriangleProc.java); the
k-truss — the maximal subgraph in which every EDGE closes at least k−2
triangles — is the canonical next step (Cohen 2008, "Trusses: cohesive
subgraphs for social network analysis"): a stricter, less
chain-sensitive community core than the k-core, and a standard
spam-farm / cohesive-cluster extractor on web graphs. Shipped as an
engine extension beside k-core.

Computation: iterative support peel. Per round, per-edge triangle
support is recomputed on the surviving canonical edge set and edges
with support < k−2 are dropped; the k-truss is the fixpoint (monotone
shrinkage, like the k-core's vertex peel but edge-valued).

Scale shape: each round is one triangle enumeration over the surviving
edges — the id-oriented wedge join (e(a,b) ⋈ e(a,c) on a with b<c,
closed against e(b,c)) — followed by a 3-role union, one (a,b)-keyed
count with map-side combine, and one edge-keyed left join + filter.
No UDFs; per-round state is the edge set itself, checkpointed to cut
Catalyst lineage (edge-SIZED checkpoints — heavier than the k-core's
vertex-sized ones; bounded by the strictly shrinking survivor set).
``max_rounds`` makes the peel deterministic-depth and therefore
round-by-round SQL-replayable (the driver oracle unrolls it), exactly
the k-core oracle pattern.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.loop_conf import superstep_conf

__all__ = ["k_truss", "KTrussResult"]


@dataclass
class KTrussResult:
    edges: DataFrame  # (a, b) canonical surviving edges, a < b
    rounds: int
    converged: bool
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _canonical_edges(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.select(F.least("src", "dst").alias("a"),
                 F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def _supports(e: DataFrame) -> DataFrame:
    """(a, b, s): triangle support per canonical edge of ``e``."""
    x = e.select(F.col("a").alias("p"), F.col("b").alias("q"))
    y = e.select(F.col("a").alias("p"), F.col("b").alias("r"))
    tri = (
        x.join(y, "p")
        .filter(F.col("q") < F.col("r"))
        .join(e.select(F.col("a").alias("q"), F.col("b").alias("r")),
              ["q", "r"], "leftsemi")
    )
    roles = (
        tri.select(F.col("p").alias("a"), F.col("q").alias("b"))
        .unionAll(tri.select(F.col("p").alias("a"), F.col("r").alias("b")))
        .unionAll(tri.select(F.col("q").alias("a"), F.col("r").alias("b")))
    )
    return roles.groupBy("a", "b").agg(F.count(F.lit(1)).alias("s"))


def k_truss(
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int | None = None,
    spark: SparkSession | None = None,
) -> KTrussResult:
    """Canonical edges (a < b) of the k-truss: every surviving edge
    closes ≥ k−2 triangles within the surviving subgraph.

    ``max_rounds`` bounds the peel (None = run to the fixpoint). With a
    bound the result is the round-``max_rounds`` peel state — a
    superset of the true k-truss, deterministic and SQL-replayable
    round by round."""
    if k < 3:
        raise ValueError("k must be >= 3 (k-2 triangles per edge)")
    spark = spark or edges.sparkSession
    e = _canonical_edges(edges).localCheckpoint(eager=True)
    n_edges = e.count()
    rounds, converged = 0, False
    metrics: list[dict[str, Any]] = []
    with superstep_conf(spark, n_edges):
        while max_rounds is None or rounds < max_rounds:
            sup = _supports(e)
            nxt = (
                e.join(sup, ["a", "b"], "left")
                .filter(F.coalesce(F.col("s"), F.lit(0)) >= k - 2)
                .select("a", "b")
                .localCheckpoint(eager=True)
            )
            n_next = nxt.count()
            rounds += 1
            metrics.append({"round": rounds, "edges": n_next,
                            "removed": n_edges - n_next})
            if n_next == n_edges:
                converged = True
                e = nxt
                break
            e, n_edges = nxt, n_next
            if n_edges == 0:
                converged = True
                break
    return KTrussResult(e, rounds, converged, metrics)
