"""Local graph clustering: sweep cuts over a score vector and
PPR-Nibble (personalized-PageRank seeded community extraction).

Extends the reference's community suite (its Louvain/labelPropagation
surface — LouvainProc.java, LabelPropagationProc.java — computes
*global* partitions) with the classic *local* method for web-scale
graphs: Andersen, Chung & Lang, "Local Graph Partitioning using
PageRank Vectors" (FOCS'06). Given seed pages, compute an
(approximate) personalized PageRank vector, order vertices by
``score/degree``, and return the prefix ("sweep") with minimum
conductance — the community around the seeds, touching only the PPR
support rather than the whole graph.

Spark-first shape (all sizes are support-sized, never all-pairs):

- the PPR vector comes from :func:`..pagerank.pagerank_batch_personalized`
  (one edge join + one dst-keyed aggregation per superstep);
- the global sweep ordering and BOTH running sums (volume, cut-edge
  count) use :func:`..plans.ranking.ranked_prefix_sums` — range
  repartition + per-partition offsets, NO single-partition window;
- cut counts use a difference array: an undirected edge with sweep
  positions (lo, hi) is in the cut exactly for prefixes lo ≤ k < hi,
  so it contributes +1 at ``lo`` and −1 at ``hi`` (no −1 when the far
  endpoint is outside the support — it stays cut for every prefix).
  One join of the edge table against the support-sized rank table,
  then a prefix sum — never a per-prefix recount.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.ranking import ranked_prefix_sums

__all__ = ["sweep_cut", "ppr_local_cluster", "LocalClusterResult"]


@dataclass
class LocalClusterResult:
    sweep: DataFrame        # (pos, id, vol, cut, conductance)
    best_conductance: float
    best_size: int


def _undirected(edges: DataFrame) -> DataFrame:
    """Canonical undirected simple edge set: (a < b), self-loops dropped."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


def sweep_cut(
    edges: DataFrame,
    scores: DataFrame,
    *,
    score_col: str = "score",
    quantize: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Conductance of every prefix of vertices ordered by
    ``score/degree`` descending (ties by id) — the ACL sweep.

    ``scores``: (id, score). Only rows with positive (quantized) score
    participate (the PPR support); edges to vertices outside the
    support count toward the cut of every prefix. Degrees and volumes
    are over the undirected simple graph induced by ``edges``
    (symmetrized, deduplicated, self-loops dropped).

    ``quantize``: round the score to this many decimals before
    ordering/filtering. Cross-engine float sums can differ by ulps; a
    quantized ordering key (identical doubles, then IEEE division by
    the integer degree) makes the sweep order — and therefore every
    output row — reproducible bit-for-bit against a SQL replay.

    Returns (pos, id, vol, cut, conductance), one row per support
    vertex in sweep order, conductance = cut / min(vol, 2m − vol)
    rounded to 6 decimals (rows where the denominator is 0 — a prefix
    covering the entire graph volume — are excluded).
    """
    # materialized once (localCheckpoint, not persist+unpersist: the
    # cut-pair join below still references it after this function's
    # bookkeeping would have unpersisted it)
    und = _undirected(edges).localCheckpoint(eager=True)
    m = und.count()
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    )

    s = scores.select("id", F.col(score_col).alias("_s"))
    if quantize is not None:
        s = s.select("id", F.round("_s", quantize).alias("_s"))
    sup = (
        s.filter(F.col("_s") > 0)
        .join(deg, "id")
        .withColumn("_q", F.col("_s") / F.col("deg"))
    )

    ranked = ranked_prefix_sums(
        sup,
        [F.desc("_q"), F.asc("id")],
        {"deg": "vol"},
        rank_col="pos",
        num_partitions=num_partitions,
    )

    ra = ranked.select(F.col("id").alias("a"), F.col("pos").alias("_pa"))
    rb = ranked.select(F.col("id").alias("b"), F.col("pos").alias("_pb"))
    pairs = (
        und.join(ra, "a", "left").join(rb, "b", "left")
        .filter(F.col("_pa").isNotNull() | F.col("_pb").isNotNull())
        .select("_pa", "_pb")
    )
    plus = pairs.select(
        F.when(F.col("_pa").isNull(), F.col("_pb"))
        .when(F.col("_pb").isNull(), F.col("_pa"))
        .otherwise(F.least("_pa", "_pb")).alias("pos"),
        F.lit(1).alias("delta"),
    )
    minus = pairs.filter(
        F.col("_pa").isNotNull() & F.col("_pb").isNotNull()
    ).select(
        F.greatest("_pa", "_pb").alias("pos"), F.lit(-1).alias("delta"),
    )
    ev = plus.unionAll(minus).groupBy("pos").agg(
        F.sum("delta").alias("_delta"))

    with_ev = ranked.join(ev, "pos", "left").select(
        "pos", "id", "vol",
        F.coalesce(F.col("_delta"), F.lit(0)).alias("_delta"),
    )
    swept = ranked_prefix_sums(
        with_ev, [F.asc("pos")], {"_delta": "cut"},
        rank_col="_rank2", num_partitions=num_partitions,
    )

    m2 = 2.0 * m
    den = F.least(F.col("vol"), F.lit(m2) - F.col("vol"))
    return (
        swept.filter(den > 0)
        .select(
            "pos", "id",
            F.col("vol").cast("long").alias("vol"),
            F.col("cut").cast("long").alias("cut"),
            (F.round(F.col("cut") / den, 6) + F.lit(0.0))
            .alias("conductance"),
        )
    )


def ppr_local_cluster(
    vertices: DataFrame,
    edges: DataFrame,
    seeds: list[int],
    *,
    damping: float = 0.85,
    max_iterations: int = 10,
    quantize: int | None = 6,
    spark: SparkSession | None = None,
) -> LocalClusterResult:
    """PPR-Nibble: personalized PageRank from ``seeds`` (fixed
    ``max_iterations`` supersteps of the batch-PPR loop), then a sweep
    cut over ``score/degree``. The sweep prefix with minimum
    conductance is the local community around the seeds.

    The PPR support (not the whole graph) bounds every sweep-side
    shuffle; the PPR loop itself is the measured batch-personalized
    superstep (one edge-table scan per superstep regardless of seed
    count).
    """
    from .pagerank import pagerank_batch_personalized

    res = pagerank_batch_personalized(
        vertices, edges, [list(seeds)],
        damping=damping, max_iterations=max_iterations, tol=0.0,
        spark=spark,
    )
    scores = res.ranks.select("id", F.col("r0").alias("score"))
    sweep = sweep_cut(edges, scores, quantize=quantize).persist()
    best = (
        sweep.orderBy(F.asc("conductance"), F.asc("pos"))
        .select("conductance", "pos").first()
    )
    return LocalClusterResult(
        sweep,
        float(best["conductance"]) if best else float("nan"),
        int(best["pos"]) if best else 0,
    )
