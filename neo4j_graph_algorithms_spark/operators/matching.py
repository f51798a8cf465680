"""Distributed maximal matching by locally-minimal edges.

The edge-side sibling of Luby MIS (``operators/mis.py``): per round,
an edge joins the matching iff its priority is the strict minimum
among ALL edges incident to either endpoint (Israeli & Itai 1986's
symmetry-breaking idea with deterministic keys); matched endpoints
and their incident edges leave the graph; repeat. Locally-minimal
edges are never adjacent (two adjacent edges share a vertex whose
incident minimum only one of them can be), so each round adds an
independent edge set, and a converged run is a MAXIMAL matching —
every remaining edge has a matched endpoint.

Maximal matching is the classic primitive behind coarsening for
multilevel graph partitioning (METIS-style), degree-bounded
sparsification, and 2-approximate vertex cover (the matched endpoints)
— none of which the reference ships, all of which a web-graph pipeline
reaches for.

Determinism: the per-round priority is
``md5('{seed}|{round}|{lo}|{hi}') || '-' || lpad(lo) || lpad(hi)`` —
a strict total order (the id suffix breaks even md5 collisions), the
same contract as ``mis.py``, so fixed-round runs replay exactly in the
DuckDB oracle (__spark_entry__._matching_unrolled_sql).

Scale shape per round: one union-explode of edge endpoints, one
vertex-keyed min aggregation with map-side combine, one double
equi-join selecting the local minima, two anti-joins shrinking the
live edge set. All joins keyed by vertex or canonical edge — AQE skew
handling applies; no window, no Python, no driver state beyond
round counters.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["maximal_matching", "coarsen_graph",
           "vertex_cover_2approx", "MatchingResult"]


@dataclass
class MatchingResult:
    matching: DataFrame    # (u, v, round) — u < v, vertex-disjoint
    rounds: int
    converged: bool
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _pri(rnd: int, seed: int) -> F.Column:
    return F.concat_ws(
        "-",
        F.md5(F.concat_ws("|", F.lit(str(seed)), F.lit(str(rnd)),
                          F.col("lo").cast("string"),
                          F.col("hi").cast("string"))),
        F.lpad(F.col("lo").cast("string"), 12, "0"),
        F.lpad(F.col("hi").cast("string"), 12, "0"),
    )


def maximal_matching(
    edges: DataFrame,
    *,
    seed: int = 42,
    max_rounds: int | None = None,
    spark: SparkSession | None = None,
) -> MatchingResult:
    """Vertex-disjoint edge set ``(u, v, round)`` with ``u < v``.

    With ``max_rounds`` set, the result is the deterministic union of
    the first ``max_rounds`` rounds' locally-minimal edges — a valid
    matching always, maximal iff ``converged``. Self-loops are
    dropped (they cannot be matched); parallel edges collapse.
    """
    spark = spark or edges.sparkSession

    live = (
        edges.select(F.least("src", "dst").alias("lo"),
                     F.greatest("src", "dst").alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .dropDuplicates(["lo", "hi"])
        .localCheckpoint(eager=True)
    )
    matched = None
    rounds, converged = 0, False
    metrics: list[dict[str, Any]] = []
    bound = max_rounds if max_rounds is not None else 64

    for rnd in range(1, bound + 1):
        n_live = live.count()
        if n_live == 0:
            converged = True
            break
        rounds = rnd
        e = live.withColumn("_p", _pri(rnd, seed))
        inc = (
            e.select(F.col("lo").alias("v"), "_p")
            .unionByName(e.select(F.col("hi").alias("v"), "_p"))
        )
        vmin = inc.groupBy("v").agg(F.min("_p").alias("_vm"))
        sel = (
            e.join(vmin.select(F.col("v").alias("lo"),
                               F.col("_vm").alias("_ml")), "lo")
            .join(vmin.select(F.col("v").alias("hi"),
                              F.col("_vm").alias("_mh")), "hi")
            .where((F.col("_p") == F.col("_ml"))
                   & (F.col("_p") == F.col("_mh")))
            .select("lo", "hi", F.lit(rnd).alias("round"))
            .localCheckpoint(eager=True)
        )
        n_sel = sel.count()
        metrics.append({"round": rnd, "live_edges": n_live,
                        "matched": n_sel})
        matched = sel if matched is None else matched.unionByName(sel)
        mv = (
            sel.select(F.col("lo").alias("v"))
            .unionByName(sel.select(F.col("hi").alias("v")))
            .distinct()
        )
        live = (
            live.join(mv.select(F.col("v").alias("lo")), "lo", "left_anti")
            .join(mv.select(F.col("v").alias("hi")), "hi", "left_anti")
            .select("lo", "hi")
            .localCheckpoint(eager=True)
        )
    else:
        converged = live.count() == 0

    if matched is None:
        # derive lo/hi types from the input so the empty result's schema
        # matches the non-empty path for int/string vertex ids too
        matched = spark.createDataFrame(
            [], live.schema.add("round", "int", nullable=False))
    out = matched.select(F.col("lo").alias("u"), F.col("hi").alias("v"),
                         "round")
    return MatchingResult(matching=out, rounds=rounds,
                          converged=converged, metrics=metrics)


def coarsen_graph(
    edges: DataFrame,
    matching: DataFrame,
) -> DataFrame:
    """One multilevel-coarsening step (METIS-style): contract every
    matched pair to its min endpoint and re-aggregate edges.

    ``matching`` is :func:`maximal_matching`'s ``(u, v, ...)`` output
    (vertex-disjoint). Returns the coarse multigraph ``(src, dst,
    weight)`` — endpoints relabeled to their supervertex (matched →
    min(u, v), unmatched → self), self-loops dropped (intra-supervertex
    edges), parallel edges summed into ``weight`` (unit input weights;
    a weighted input would sum its weight column the same way).

    Scale shape: the matching table is a vertex-sized (at most |V|/2
    rows) relabel map — two broadcastable left joins onto the edge
    list, then ONE hash aggregation with map-side combine. Iterating
    (match → coarsen → match …) halves the graph per level at matching
    ratio 1, the standard multilevel pipeline.
    """
    remap = (
        matching.select(F.col("u").alias("id"),
                        F.least("u", "v").alias("super"))
        .unionByName(matching.select(F.col("v").alias("id"),
                                     F.least("u", "v").alias("super")))
    )
    e = edges.select("src", "dst")
    relabeled = (
        e.join(F.broadcast(remap.withColumnsRenamed(
            {"id": "src", "super": "_ss"})), "src", "left")
        .join(F.broadcast(remap.withColumnsRenamed(
            {"id": "dst", "super": "_ds"})), "dst", "left")
        .select(F.coalesce("_ss", F.col("src")).alias("src"),
                F.coalesce("_ds", F.col("dst")).alias("dst"))
    )
    return (
        relabeled.where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def vertex_cover_2approx(
    edges: DataFrame,
    *,
    seed: int = 42,
    max_rounds: int | None = None,
) -> DataFrame:
    """2-approximate minimum vertex cover: BOTH endpoints of a maximal
    matching (Gavril/Yannakakis — any maximal matching's endpoint set
    covers every edge, and no cover can take fewer than one endpoint
    per matched edge, hence factor 2). Returns ``(id)``.

    The classic dual use of :func:`maximal_matching`; at crawl scale
    this is the "monitor set" trick — a vertex set guaranteed to touch
    every link with at most 2× the optimal number of monitored hosts.
    """
    m = maximal_matching(edges, seed=seed, max_rounds=max_rounds).matching
    return (
        m.select(F.col("u").alias("id"))
        .unionByName(m.select(F.col("v").alias("id")))
        .distinct()
    )
