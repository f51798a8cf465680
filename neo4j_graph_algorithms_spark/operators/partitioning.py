"""Multilevel graph bisection — the METIS recipe on the engine's own
matching/coarsening primitives.

Multilevel partitioning (Karypis & Kumar 1998) is THE way large graphs
are split for distribution: (1) COARSEN — contract a maximal matching
per level until the graph is small; (2) PARTITION the coarsest graph;
(3) UNCOARSEN — project labels back through the contraction maps.
A web-graph warehouse uses exactly this to assign vertices to
executors/shards so that most edges stay shard-local.

This module composes :func:`~...operators.matching.maximal_matching`
and :func:`~...operators.matching.coarsen_graph` for the V-cycle and
keeps the coarsest-level split DETERMINISTIC — supervertices are
ranked by id and split by rank parity (even/odd → part 0/1) — so a
fixed-level fixed-round run is exactly SQL-replayable (the driver
oracle chains the matching/coarsening CTEs and a row_number parity).
Rank-parity splitting balances COUNTS by construction; it is the
baseline initial partition (METIS would refine it — a KL/FM boundary
pass is a documented extension point, deliberately not fused in so the
oracle row stays a pure function of the chain).

Scale shape: each level is the matching loop (vertex-keyed min aggs +
anti-joins) plus one broadcast-remap contraction; label projection
back is L vertex-sized left joins (the remap chain), one rank of the
COARSEST vertex set (tiny by construction — plans/ranking.py-style
concerns don't arise), and one final edge join for the cut metric.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F

__all__ = ["multilevel_bisect", "refine_bisection",
           "partition_kway", "BisectResult"]


@dataclass
class BisectResult:
    labels: DataFrame        # (id, part) — part ∈ {0, 1}
    edge_cut: int            # edges crossing the parts (distinct pairs)
    part_sizes: dict         # part -> vertex count
    levels: int
    metrics: list[dict[str, Any]] = field(default_factory=list)


def multilevel_bisect(
    edges: DataFrame,
    *,
    levels: int = 2,
    rounds_per_level: int = 6,
    seed: int = 42,
) -> BisectResult:
    """Bisect the undirected view of ``edges`` (see module docstring).

    ``levels`` matching+contraction levels (level l uses ``seed + l``
    so the per-level priorities are independent), then the rank-parity
    split of the coarsest supervertices, projected back through the
    contraction maps. Vertices isolated at any level keep riding the
    chain (they map to themselves) and receive a part from their
    coarsest representative's rank like everyone else.
    """
    from neo4j_graph_algorithms_spark.operators.matching import (
        coarsen_graph,
        maximal_matching,
    )

    e = (
        edges.select(F.least("src", "dst").alias("src"),
                     F.greatest("src", "dst").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    v0 = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    # cur: (id, rep) — current coarsest representative of each vertex
    cur = v0.select("id", F.col("id").alias("rep"))
    level_edges = e
    metrics: list[dict[str, Any]] = []
    for lvl in range(1, levels + 1):
        m = maximal_matching(level_edges, seed=seed + lvl,
                             max_rounds=rounds_per_level).matching
        remap = (
            m.select(F.col("u").alias("rep"),
                     F.least("u", "v").alias("_super"))
            .unionByName(m.select(F.col("v").alias("rep"),
                                  F.least("u", "v").alias("_super")))
        )
        cur = (
            cur.join(F.broadcast(remap), "rep", "left")
            .select("id", F.coalesce("_super", F.col("rep")).alias("rep"))
            .localCheckpoint(eager=True)
        )
        coarse = coarsen_graph(level_edges, m)
        level_edges = (
            coarse.select(F.least("src", "dst").alias("src"),
                          F.greatest("src", "dst").alias("dst"))
            .dropDuplicates(["src", "dst"])
            .localCheckpoint(eager=True)
        )
        metrics.append({"level": lvl,
                        "coarse_edges": level_edges.count()})

    reps = cur.select(F.col("rep").alias("id")).distinct()
    from pyspark.sql import Window

    w = Window.orderBy("id")
    part = reps.select(
        "id", ((F.row_number().over(w) - 1) % 2).alias("part"))
    labels = (
        cur.join(part.select(F.col("id").alias("rep"), "part"), "rep")
        .select("id", "part")
        .localCheckpoint(eager=True)
    )
    la = labels.select(F.col("id").alias("src"), F.col("part").alias("_pa"))
    lb = labels.select(F.col("id").alias("dst"), F.col("part").alias("_pb"))
    edge_cut = (
        e.join(la, "src").join(lb, "dst")
        .where(F.col("_pa") != F.col("_pb"))
        .count()
    )
    sizes = {r.part: r.n for r in
             labels.groupBy("part").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    return BisectResult(labels=labels, edge_cut=int(edge_cut),
                        part_sizes=sizes, levels=levels, metrics=metrics)


def refine_bisection(
    labels: DataFrame,
    edges: DataFrame,
    *,
    rounds: int = 4,
    seed: int = 42,
) -> DataFrame:
    """KL/FM-flavored boundary refinement, distributed and MONOTONE.

    Kernighan-Lin moves vertices one at a time — inherently sequential.
    This pass flips an INDEPENDENT SET of positive-gain vertices per
    round instead: a vertex's gain (external − internal neighbors) is
    exact when none of its neighbors flips in the same round, so
    selecting flips that are locally maximal by a strict priority
    (gain DESC, then the md5 total-order key) guarantees every realized
    gain equals its computed gain and the edge cut STRICTLY DECREASES
    by the round's gain sum — no oscillation, no stale-gain hazard
    (test-pinned). Balance control: only vertices in the LARGER part
    may flip (ties: part 1), at most ``max(1, gap // 2)`` per round
    (best priorities first), so the size gap never exceeds
    ``max(initial_gap, 2)`` — the one-flip tolerance FM-style
    refinement needs to escape a perfectly balanced local optimum.

    Returns refined ``(id, part)``. Deterministic at fixed ``rounds``.

    Scale shape per round: one degree-style neighbor aggregation
    (vertex-keyed, map-side combine), one symmetric-edge join among
    candidates for the local-max selection, vertex-sized joins
    elsewhere — the mis.py discipline applied to boundary moves. The
    ``limit(k_cap)`` is a TakeOrdered over the CANDIDATE set (positive-
    gain locally-max boundary vertices — boundary-sized, not |V|); on a
    pathologically unbalanced input raise ``rounds`` rather than
    expecting one huge capped round.
    """
    sym = (
        edges.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    sym = (
        sym.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(sym.select(F.col("b").alias("u"),
                                F.col("a").alias("v")))
        .localCheckpoint(eager=True)
    )
    lab = labels.select("id", "part").localCheckpoint(eager=True)
    for rnd in range(1, rounds + 1):
        sizes = {r.part: r.n for r in
                 lab.groupBy("part").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
        big = 1 if sizes.get(1, 0) >= sizes.get(0, 0) else 0
        lu = lab.select(F.col("id").alias("u"), F.col("part").alias("_pu"))
        lv = lab.select(F.col("id").alias("v"), F.col("part").alias("_pv"))
        gains = (
            sym.join(lu, "u").join(lv, "v")
            .groupBy("u", "_pu")
            .agg((F.sum(F.when(F.col("_pv") != F.col("_pu"), 1)
                        .otherwise(-1))).alias("gain"))
        )
        pri = F.concat_ws(
            "-",
            F.lpad((F.lit(1_000_000) - F.col("gain")).cast("string"),
                   9, "0"),
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.lit(str(rnd)),
                              F.col("u").cast("string"))),
            F.lpad(F.col("u").cast("string"), 12, "0"),
        )
        cand = (
            gains.where((F.col("gain") > 0) & (F.col("_pu") == big))
            .select("u", pri.alias("_pr"))
            .localCheckpoint(eager=True)
        )
        # locally minimal priority (= locally maximal gain) among
        # candidate neighbors -> flips form an independent set
        nbr_best = (
            sym.join(cand.select(F.col("u").alias("v"),
                                 F.col("_pr").alias("_nb")), "v")
            .groupBy("u").agg(F.min("_nb").alias("_bestnb"))
        )
        gap = abs(sizes.get(1, 0) - sizes.get(0, 0))
        k_cap = max(1, gap // 2)
        flips = (
            cand.join(nbr_best, "u", "left")
            .where(F.col("_bestnb").isNull()
                   | (F.col("_pr") < F.col("_bestnb")))
            .orderBy("_pr")
            .limit(k_cap)
            .select(F.col("u").alias("id"))
        )
        lab = (
            lab.join(flips.withColumn("_f", F.lit(1)), "id", "left")
            .select("id",
                    F.when(F.col("_f").isNotNull(),
                           F.lit(1) - F.col("part"))
                    .otherwise(F.col("part")).alias("part"))
            .localCheckpoint(eager=True)
        )
    return lab


def partition_kway(
    edges: DataFrame,
    k: int,
    *,
    levels: int = 2,
    rounds_per_level: int = 6,
    seed: int = 42,
    refine_rounds: int = 0,
) -> DataFrame:
    """k-way partition by recursive bisection (METIS's k-way recipe for
    power-of-two k; other k get the nearest balanced split tree).
    Returns ``(id, part)`` with ``part ∈ [0, k)``.

    Each recursion level bisects every current part's INDUCED subgraph
    (optionally refining with :func:`refine_bisection`), relabeling
    ``part → 2·part + side``; recursion depth is ``ceil(log2 k)`` and
    parts beyond ``k`` are folded back onto ``part − k`` (the standard
    uneven-k trick, keeping sizes within one split of each other).

    The driver loop is over PARTS (≤ k iterations total across the
    tree) — each induced-subgraph bisection is the distributed
    :func:`multilevel_bisect`; no per-vertex driver state.
    """
    import math

    depth = max(1, math.ceil(math.log2(k)))
    labels = None
    v_all = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = v_all.select("id", F.lit(0).alias("part"))
    for d in range(depth):
        new_labels = None
        for p in [r.part for r in
                  labels.select("part").distinct().orderBy("part")
                  .collect()]:
            members = labels.where(F.col("part") == p).select("id")
            sub = (
                edges.join(members.withColumnRenamed("id", "src"), "src")
                .join(members.withColumnRenamed("id", "dst"), "dst")
                .select("src", "dst")
            )
            if sub.limit(1).count() == 0:
                side = members.select(
                    "id", F.lit(2 * p).alias("part"))
            else:
                res = multilevel_bisect(
                    sub, levels=levels,
                    rounds_per_level=rounds_per_level,
                    seed=seed + d * 131 + p)
                lab = res.labels
                if refine_rounds > 0:
                    lab = refine_bisection(lab, sub,
                                           rounds=refine_rounds,
                                           seed=seed + d * 131 + p)
                # vertices isolated inside the part keep side 0
                side = (
                    members.join(lab, "id", "left")
                    .select("id",
                            (F.lit(2 * p)
                             + F.coalesce(F.col("part"), F.lit(0)))
                            .alias("part"))
                )
            new_labels = (side if new_labels is None
                          else new_labels.unionByName(side))
        labels = new_labels.localCheckpoint(eager=True)
    # fold surplus parts of an uneven k back into range
    return labels.select(
        "id",
        F.when(F.col("part") >= k, F.col("part") - k)
        .otherwise(F.col("part")).cast("int").alias("part"))
