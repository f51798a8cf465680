"""Maximal independent set (Luby) and greedy coloring by iterated MIS.

The reference has no MIS/coloring procedure (its surface stops at the
community/centrality algorithms — algo/src/main/java/org/neo4j/graphalgo
has no MISProc), but MIS is the canonical symmetry-breaking primitive of
distributed graph processing (Luby, "A Simple Parallel Algorithm for the
Maximal Independent Set Problem", SIAM J. Comput. 1986) and the engine
ships it as an extension: landing-page selection among near-duplicate
clusters, independent crawl scheduling sets, and the kernel of
distance-2 operators like greedy coloring.

Determinism: Luby's coin flips are replaced by a per-round md5 priority
key ``md5('{seed}|{round}|{id}') || '-' || lpad(id, 12, '0')`` — a
strict total order (the lpad(id) suffix breaks even md5 collisions) that
both engines compute identically, so a fixed-round run is SQL-replayable
(the driver oracle unrolls it round by round, the k_core pattern). A
vertex joins the MIS when its key is smaller than every surviving
neighbor's key; winners and their neighbors then leave the graph. Each
round kills >= 1/2 of the surviving edges in expectation, so O(log m)
rounds converge; a converged state is a fixpoint (no alive vertices),
making fixed-round oracles exact once the peel has converged.

Scale shape: per round ONE vertex-keyed aggregation (min neighbor key —
map-side combinable, hub keys collapse in the combiner) plus
vertex-sized semi/anti joins. The edge table is symmetrized once,
persisted pre-partitioned by u, and re-filtered per round; state is
always vertex-sized. No UDFs, no driver state beyond round counters.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.loop_conf import superstep_conf

__all__ = ["maximal_independent_set", "greedy_coloring", "MISResult"]


@dataclass
class MISResult:
    members: DataFrame  # (id) — the independent set
    rounds: int
    converged: bool  # True iff no vertex is left undecided
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _sym_edges(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(e.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .dropDuplicates(["u", "v"])
    )


def _prio_key(seed: int, rnd: int):
    """Strict-total-order priority: md5 over (seed, round, id) with the
    zero-padded id appended so even a hash collision cannot tie."""
    return F.concat(
        F.md5(F.concat_ws("|", F.lit(str(seed)), F.lit(str(rnd)),
                          F.col("id").cast("string"))),
        F.lit("-"),
        F.lpad(F.col("id").cast("string"), 12, "0"),
    )


def maximal_independent_set(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    seed: int = 42,
    max_rounds: int | None = None,
    spark: SparkSession | None = None,
) -> MISResult:
    """Luby MIS over the undirected view of ``edges``.

    With ``max_rounds`` set the result is the (deterministic) set of
    winners of the first ``max_rounds`` rounds — an independent set,
    maximal iff the run converged (``converged`` reports it; a converged
    state is stable under further rounds, so fixed-round driver oracles
    replay it exactly). Isolated vertices win in round 1 (no neighbor
    key beats theirs).
    """
    spark = spark or vertices.sparkSession

    sym = _sym_edges(edges)
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = sym.repartition(shuffle_n, "u").sortWithinPartitions("u").persist()
    sym.count()

    alive = vertices.select("id").localCheckpoint(eager=True)
    n_alive = alive.count()
    mis = None
    rounds = 0
    metrics: list[dict[str, Any]] = []

    with superstep_conf(spark, n_alive):
        while n_alive > 0 and (max_rounds is None or rounds < max_rounds):
            rounds += 1
            keyed = alive.withColumn("_k", _prio_key(seed, rounds))
            # min surviving-neighbor key per surviving vertex: one
            # map-side-combinable agg — a degree-10^6 hub contributes
            # one combiner cell per map partition, never a fan-out row
            live = (
                sym.join(alive.withColumnRenamed("id", "u"), "u", "leftsemi")
                .join(alive.withColumnRenamed("id", "v"), "v", "leftsemi")
            )
            nbr_min = (
                live.join(
                    keyed.select(F.col("id").alias("v"),
                                 F.col("_k").alias("_vk")), "v")
                .groupBy("u")
                .agg(F.min("_vk").alias("_nk"))
                .withColumnRenamed("u", "id")
            )
            winners = (
                keyed.join(nbr_min, "id", "left")
                .filter(F.col("_nk").isNull() | (F.col("_k") < F.col("_nk")))
                .select("id")
                .localCheckpoint(eager=True)
            )
            n_win = winners.count()
            mis = winners if mis is None else mis.union(winners)
            # winners + their neighbors leave. Winners ⊆ alive, so the
            # u-side alive filter is redundant here — semi-join by the
            # (tiny) winner set FIRST, then the vertex-sized alive
            # filter on v; the winner probe prunes the edge scan before
            # anything vertex-sized moves
            nbrs = (
                sym.join(winners.withColumnRenamed("id", "u"), "u",
                         "leftsemi")
                .join(alive.withColumnRenamed("id", "v"), "v", "leftsemi")
                .select(F.col("v").alias("id"))
                .distinct()
            )
            alive = (
                alive.join(winners, "id", "leftanti")
                .join(nbrs, "id", "leftanti")
                .localCheckpoint(eager=True)
            )
            n_prev, n_alive = n_alive, alive.count()
            metrics.append({"round": rounds, "winners": n_win,
                            "alive": n_alive,
                            "removed": n_prev - n_alive})

    sym.unpersist()
    members = (mis if mis is not None
               else vertices.select("id").limit(0)).localCheckpoint(
                   eager=True)
    return MISResult(members, rounds, n_alive == 0, metrics)


def greedy_coloring(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    seed: int = 42,
    max_colors: int | None = None,
    mis_rounds: int | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """(id, color): proper vertex coloring by iterated MIS — color c is
    a Luby MIS of the graph induced on the still-uncolored vertices
    (Jones & Plassmann's classic reduction). Colors are 0-based; with
    ``max_colors`` set, vertices still uncolored at the cap get color
    -1 (undecided) so the output stays total and deterministic.

    ``mis_rounds`` caps each inner MIS (None = run each to its
    fixpoint; a capped inner run still yields an independent — merely
    not maximal — color class, so the coloring stays proper and
    SQL-replayable with nested fixed bounds)."""
    spark = spark or vertices.sparkSession
    uncolored = vertices.select("id")
    out = None
    color = 0
    while max_colors is None or color < max_colors:
        n = uncolored.count()
        if n == 0:
            break
        res = maximal_independent_set(
            uncolored, edges, seed=seed + color * 1_000_003,
            max_rounds=mis_rounds, spark=spark)
        cls = res.members.withColumn("color", F.lit(color))
        out = cls if out is None else out.union(cls)
        uncolored = uncolored.join(res.members, "id", "leftanti") \
                             .localCheckpoint(eager=True)
        color += 1
    rest = uncolored.withColumn("color", F.lit(-1))
    out = rest if out is None else out.union(rest)
    return out
