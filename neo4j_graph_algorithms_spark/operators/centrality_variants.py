"""PageRank-family variants: ArticleRank and eigenvector centrality.

Reference semantics:

- ArticleRank (algo/.../ArticleRankProc.java:68-99;
  impl/pagerank/ArticleRankComputeStep.java): the PageRank loop with the
  contribution denominator shifted by the graph's average out-degree —
  ``f(u→v) = 1 / (outDeg(u) + avgDeg)`` — damping/base unchanged, so
  low-degree pages are deflated relative to PageRank.
- Eigenvector centrality (algo/.../EigenvectorCentralityProc.java:60-91;
  impl/pagerank/EigenvectorCentralityComputeStep.java + Normalization.java:19-35):
  plain power iteration (no damping, no base term), per-iteration L2
  normalization; final vector optionally re-normalized by
  'none' | 'max' | 'l1norm' | 'l2norm'.

Both reuse the superstep shape of :mod:`.pagerank` (one join + one
dst-keyed aggregation per iteration, edge side pre-partitioned once).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["articlerank", "eigenvector_centrality"]


@dataclass
class CentralityResult:
    scores: DataFrame  # (id, score)
    iterations: int
    converged: bool
    metrics: list[dict[str, Any]] = field(default_factory=list)


def articlerank(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 0.0,
    spark: SparkSession | None = None,
) -> CentralityResult:
    spark = spark or vertices.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    avg_deg = deg.agg(F.avg("_deg")).first()[0] or 0.0
    ef = (
        edges.join(deg, "src")
        .select("src", "dst",
                (F.lit(1.0) / (F.col("_deg") + F.lit(avg_deg))).alias("factor"))
        .repartition(shuffle_n, "src")
        .persist()
    )
    ef.count()

    alpha = 1.0 - damping
    ranks = vertices.select("id", F.lit(alpha).alias("rank")).persist()
    converged, it, max_delta = False, 0, float("inf")
    metrics: list[dict[str, Any]] = []
    prev_persisted = ranks
    for it in range(1, max_iterations + 1):
        msgs = (
            ef.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("factor")).alias("msg"))
        )
        new_ranks = (
            ranks.join(msgs, ranks["id"] == msgs["dst"], "left")
            .select(
                ranks["id"],
                (F.lit(alpha) + F.lit(damping)
                 * F.coalesce(F.col("msg"), F.lit(0.0))).alias("rank"),
                ranks["rank"].alias("_prev"),
            )
            .localCheckpoint(eager=False)  # truncate lineage every step
        )
        max_delta = new_ranks.agg(
            F.max(F.abs(F.col("rank") - F.col("_prev")))
        ).first()[0] or 0.0
        metrics.append({"iteration": it, "max_delta": max_delta})
        prev_persisted.unpersist()
        prev_persisted = new_ranks
        ranks = new_ranks.select("id", "rank")
        if tol > 0.0 and max_delta < tol:
            converged = True
            break
    ef.unpersist()
    return CentralityResult(ranks.select("id", F.col("rank").alias("score")),
                            it, converged, metrics)


def eigenvector_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_iterations: int = 20,
    tol: float = 0.0,
    normalization: str = "none",
    spark: SparkSession | None = None,
) -> CentralityResult:
    """Power iteration with per-iteration L2 normalization; the final
    ``normalization`` ∈ {'none','max','l1norm','l2norm'} matches
    Normalization.java:19-35."""
    spark = spark or vertices.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ef = edges.select("src", "dst").repartition(shuffle_n, "src").persist()
    ef.count()
    n = vertices.count()
    ranks = vertices.select("id", F.lit(1.0 / n).alias("rank")).persist()
    converged, it = False, 0
    metrics: list[dict[str, Any]] = []
    prev_persisted = ranks
    for it in range(1, max_iterations + 1):
        msgs = (
            ef.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("rank").alias("msg"))
        )
        raw = (
            ranks.join(msgs, ranks["id"] == msgs["dst"], "left")
            .select(ranks["id"],
                    F.coalesce(F.col("msg"), F.lit(0.0)).alias("raw"),
                    ranks["rank"].alias("_prev"))
            .localCheckpoint(eager=False)  # truncate lineage every step
        )
        l2 = raw.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw")))).first()[0] or 1.0
        l2 = l2 if l2 > 0 else 1.0
        new_ranks = raw.select(
            "id", (F.col("raw") / F.lit(l2)).alias("rank"), "_prev"
        ).persist()
        max_delta = new_ranks.agg(
            F.max(F.abs(F.col("rank") - F.col("_prev")))
        ).first()[0] or 0.0
        metrics.append({"iteration": it, "max_delta": max_delta, "l2": l2})
        raw.unpersist()
        prev_persisted.unpersist()
        prev_persisted = new_ranks
        ranks = new_ranks.select("id", "rank")
        if tol > 0.0 and max_delta < tol:
            converged = True
            break
    ef.unpersist()

    scores = ranks.select("id", F.col("rank").alias("score"))
    if normalization == "max":
        m = scores.agg(F.max("score")).first()[0] or 1.0
        scores = scores.select("id", (F.col("score") / F.lit(m)).alias("score"))
    elif normalization == "l1norm":
        s = scores.agg(F.sum("score")).first()[0] or 1.0
        scores = scores.select("id", (F.col("score") / F.lit(s)).alias("score"))
    elif normalization == "l2norm":
        s = scores.agg(F.sqrt(F.sum(F.col("score") * F.col("score")))).first()[0] or 1.0
        scores = scores.select("id", (F.col("score") / F.lit(s)).alias("score"))
    return CentralityResult(scores, it, converged, metrics)
