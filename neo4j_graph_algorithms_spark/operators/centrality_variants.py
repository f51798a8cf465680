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

__all__ = ["articlerank", "eigenvector_centrality", "hits", "salsa",
           "katz_centrality"]


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


def katz_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    alpha: float = 0.05,
    beta: float = 1.0,
    max_iterations: int = 20,
    tol: float = 0.0,
    weighted: bool = False,
    spark: SparkSession | None = None,
) -> CentralityResult:
    """Katz centrality ``x = Σ_{k≥1} α^k (Aᵀ)^k·β + β`` via the
    iteration ``x_{t+1} = α·Aᵀ·x_t + β``, ``x_0 = β·1``.

    Engine extension (not a reference procedure — it sits between the
    reference's eigenvector centrality, which this equals at β→0 up to
    normalization, and PageRank, which replaces the raw adjacency with
    the degree-normalized walk matrix). Unlike eigenvector centrality
    it is well-defined on graphs with sources/sinks, and unlike
    PageRank a hub's influence is NOT diluted by its out-degree —
    the natural "how reachable is this page" score for backlink
    analysis. Converges for α < 1/λ_max(A).

    Superstep shape = :func:`articlerank` with factor 1 (or the edge
    weight): one join against the pre-partitioned edge side + one
    dst-keyed aggregation per iteration; vertex-sized state only.
    """
    spark = spark or vertices.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    fac = (F.col("weight").cast("double") if weighted
           else F.lit(1.0)).alias("factor")
    ef = (
        edges.select("src", "dst", fac)
        .repartition(shuffle_n, "src")
        .persist()
    )
    ef.count()

    ranks = vertices.select("id", F.lit(beta).alias("rank")).persist()
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
                (F.lit(beta) + F.lit(alpha)
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


def hits(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_iterations: int = 20,
    tol: float = 0.0,
    spark: SparkSession | None = None,
) -> CentralityResult:
    """HITS hubs & authorities (Kleinberg 1999) — engine extension; the
    reference has no HITS procedure, but it is the canonical second
    link-analysis algorithm next to PageRank and reuses the exact
    superstep shape of :func:`eigenvector_centrality`, alternated over
    the two edge directions.

    Per iteration: ``auth = Aᵀ·hub`` then L2-normalize, ``hub = A·auth``
    then L2-normalize. The edge table is cached twice — once
    partitioned by ``src`` (authority gather groups by ``dst``) and
    once by ``dst`` (hub gather groups by ``src``) — so neither
    half-superstep re-shuffles the edge side; only the vertex-sized
    hub/auth state moves, the same 100×-scale contract as pagerank's
    loop. Deterministic at fixed iterations → the driver oracle unrolls
    the recurrence into chained SQL CTEs (``_hits_unrolled_sql``).

    Returns scores as ``(id, hub, authority)`` in ``CentralityResult``
    (``scores`` carries both columns).
    """
    spark = spark or vertices.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    e = edges.select("src", "dst")
    ef_src = e.repartition(shuffle_n, "src").persist()
    ef_dst = e.repartition(shuffle_n, "dst").persist()
    ef_src.count()
    ef_dst.count()

    n = vertices.count()
    state = vertices.select(
        "id", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    ).persist()
    state.count()

    converged, it = False, 0
    metrics: list[dict[str, Any]] = []
    prev_persisted = state
    for it in range(1, max_iterations + 1):
        # authority half-step: auth_raw(v) = Σ_{u→v} hub(u)
        a_msgs = (
            ef_src.join(state.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("_araw"))
        )
        mid = (
            state.join(a_msgs, state["id"] == a_msgs["dst"], "left")
            .select(state["id"], "hub",
                    F.coalesce(F.col("_araw"), F.lit(0.0)).alias("_araw"),
                    state["auth"].alias("_aprev"),
                    state["hub"].alias("_hprev"))
            .localCheckpoint(eager=False)
        )
        a_l2 = mid.agg(F.sqrt(F.sum(F.col("_araw") * F.col("_araw")))).first()[0] or 1.0
        a_l2 = a_l2 if a_l2 > 0 else 1.0
        mid = mid.select(
            "id", "hub", (F.col("_araw") / F.lit(a_l2)).alias("auth"),
            "_aprev", "_hprev",
        )
        # hub half-step: hub_raw(u) = Σ_{u→v} auth(v)
        h_msgs = (
            ef_dst.join(mid.select(F.col("id").alias("dst"), "auth"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("_hraw"))
        )
        nxt = (
            mid.join(h_msgs, mid["id"] == h_msgs["src"], "left")
            .select(mid["id"], "auth",
                    F.coalesce(F.col("_hraw"), F.lit(0.0)).alias("_hraw"),
                    "_aprev", "_hprev")
            .localCheckpoint(eager=False)
        )
        h_l2 = nxt.agg(F.sqrt(F.sum(F.col("_hraw") * F.col("_hraw")))).first()[0] or 1.0
        h_l2 = h_l2 if h_l2 > 0 else 1.0
        new_state = nxt.select(
            "id", (F.col("_hraw") / F.lit(h_l2)).alias("hub"), "auth",
            "_aprev", "_hprev",
        ).persist()
        max_delta = new_state.agg(
            F.max(F.greatest(F.abs(F.col("hub") - F.col("_hprev")),
                             F.abs(F.col("auth") - F.col("_aprev"))))
        ).first()[0] or 0.0
        metrics.append({"iteration": it, "max_delta": max_delta,
                        "auth_l2": a_l2, "hub_l2": h_l2})
        prev_persisted.unpersist()
        prev_persisted = new_state
        state = new_state.select("id", "hub", "auth")
        if tol > 0.0 and max_delta < tol:
            converged = True
            break
    ef_src.unpersist()
    ef_dst.unpersist()
    return CentralityResult(
        state.select("id", "hub", F.col("auth").alias("authority")),
        it, converged, metrics)


def salsa(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_iterations: int = 20,
    tol: float = 0.0,
    spark: SparkSession | None = None,
) -> CentralityResult:
    """SALSA hubs & authorities (Lempel & Moran 2001) — engine
    extension: the stochastic sibling of HITS used by production
    who-to-follow systems. Same alternating gather shape as
    :func:`hits`, but each half-step is degree-normalized (a random
    walk on the bipartite hub/authority graph, not a raw eigenvector):

        hub_raw(i)  = Σ_{i→j} auth(j) / in_deg(j)
        auth_raw(k) = Σ_{i→k} hub(i)  / out_deg(i)

    with L1 normalization after each half-step (scores are walk
    distributions, so they sum to 1 — HITS uses L2 on raw sums).

    100-TB shape identical to :func:`hits`: the edge table is cached
    once per gather direction (partitioned by ``src`` and by ``dst``);
    the per-node degree division happens on the VERTEX-sized state
    side before the join, so no |E|-sized intermediate carries an
    extra column and only vertex state moves per half-step.
    Deterministic at fixed iterations → unrolled SQL oracle
    (``_salsa_unrolled_sql``).

    Returns ``(id, hub, authority)`` in ``CentralityResult``.
    """
    spark = spark or vertices.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    e = edges.select("src", "dst")
    ef_src = e.repartition(shuffle_n, "src").persist()
    ef_dst = e.repartition(shuffle_n, "dst").persist()
    ef_src.count()
    ef_dst.count()
    # vertex-sized degree tables, joined onto state once per half-step
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("_outd"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("_ind"))

    n = vertices.count()
    state = (
        vertices.select("id", F.lit(1.0 / n).alias("hub"),
                        F.lit(1.0 / n).alias("auth"))
        .join(outd.withColumnRenamed("src", "id"), "id", "left")
        .join(ind.withColumnRenamed("dst", "id"), "id", "left")
        .select("id", "hub", "auth",
                F.coalesce("_outd", F.lit(0)).alias("_outd"),
                F.coalesce("_ind", F.lit(0)).alias("_ind"))
        .persist()
    )
    state.count()

    converged, it = False, 0
    metrics: list[dict[str, Any]] = []
    prev_persisted = state
    for it in range(1, max_iterations + 1):
        # hub half-step: hub_raw(i) = Σ_{i→j} auth(j)/in_deg(j)
        a_norm = state.filter(F.col("_ind") > 0).select(
            F.col("id").alias("dst"),
            (F.col("auth") / F.col("_ind")).alias("_an"))
        h_msgs = (
            ef_dst.join(a_norm, "dst")
            .groupBy("src").agg(F.sum("_an").alias("_hraw"))
        )
        mid = (
            state.join(h_msgs, state["id"] == h_msgs["src"], "left")
            .select(state["id"],
                    F.coalesce(F.col("_hraw"), F.lit(0.0)).alias("_hraw"),
                    "auth", "_outd", "_ind",
                    state["hub"].alias("_hprev"),
                    state["auth"].alias("_aprev"))
            .localCheckpoint(eager=False)
        )
        h_l1 = mid.agg(F.sum(F.abs(F.col("_hraw")))).first()[0] or 1.0
        h_l1 = h_l1 if h_l1 > 0 else 1.0
        mid = mid.select(
            "id", (F.col("_hraw") / F.lit(h_l1)).alias("hub"),
            "auth", "_outd", "_ind", "_hprev", "_aprev")
        # authority half-step: auth_raw(k) = Σ_{i→k} hub(i)/out_deg(i)
        h_norm = mid.filter(F.col("_outd") > 0).select(
            F.col("id").alias("src"),
            (F.col("hub") / F.col("_outd")).alias("_hn"))
        a_msgs = (
            ef_src.join(h_norm, "src")
            .groupBy("dst").agg(F.sum("_hn").alias("_araw"))
        )
        nxt = (
            mid.join(a_msgs, mid["id"] == a_msgs["dst"], "left")
            .select(mid["id"], "hub",
                    F.coalesce(F.col("_araw"), F.lit(0.0)).alias("_araw"),
                    "_outd", "_ind", "_hprev", "_aprev")
            .localCheckpoint(eager=False)
        )
        a_l1 = nxt.agg(F.sum(F.abs(F.col("_araw")))).first()[0] or 1.0
        a_l1 = a_l1 if a_l1 > 0 else 1.0
        new_state = nxt.select(
            "id", "hub", (F.col("_araw") / F.lit(a_l1)).alias("auth"),
            "_outd", "_ind", "_hprev", "_aprev",
        ).persist()
        max_delta = new_state.agg(
            F.max(F.greatest(F.abs(F.col("hub") - F.col("_hprev")),
                             F.abs(F.col("auth") - F.col("_aprev"))))
        ).first()[0] or 0.0
        metrics.append({"iteration": it, "max_delta": max_delta,
                        "hub_l1": h_l1, "auth_l1": a_l1})
        prev_persisted.unpersist()
        prev_persisted = new_state
        state = new_state.select("id", "hub", "auth", "_outd", "_ind")
        if tol > 0.0 and max_delta < tol:
            converged = True
            break
    ef_src.unpersist()
    ef_dst.unpersist()
    return CentralityResult(
        state.select("id", "hub", F.col("auth").alias("authority")),
        it, converged, metrics)
