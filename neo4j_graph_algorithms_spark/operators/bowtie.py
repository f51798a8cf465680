"""Bow-tie decomposition of a directed (web) graph.

Broder, Kumar, Maghoul, Raghavan, Rajagopalan, Stata, Tomkins & Wiener,
"Graph structure in the Web" (WWW 2000): the macroscopic map of a crawl
snapshot. Every page falls into one of five classes relative to the
giant strongly connected component:

- ``CORE``          — the largest SCC,
- ``IN``            — reaches the core but is not in it,
- ``OUT``           — reachable from the core but not in it,
- ``TENDRILS``      — in the core's weakly connected component but in
                      none of the above (hangs off IN, feeds into OUT,
                      or forms an IN→OUT tube bypassing the core —
                      Broder's TENDRILS + TUBES, which share the
                      "attached but rank-irrelevant" role),
- ``DISCONNECTED``  — outside the core's weak component entirely.

The class split is THE standard first-look statistic on a new crawl
(Common Crawl publishes it per snapshot) and drives frontier policy:
IN feeds discovery, OUT is a sink, TENDRILS are usually spam or dead
archives.

Relation to the reference: composes its own primitives — SCC
(algo.scc multistep, SCCProc / operators/scc.py), WCC (algo.unionFind,
operators/wcc.py) and multi-source BFS reachability (the MS-BFS
building block, msbfs/MultiSourceBFS.java) — into the published
decomposition; the reference has no bundled bowtie procedure.

100-TB shape: two label jobs (SCC, WCC — both already scale-shaped),
one count per SCC label (one agg), and two multi-source frontier
loops seeded by the ENTIRE core at once (level-synchronous, visited-set
anti-join — identical discipline to traversal.bfs_distances but with a
|core|-sized seed, which is exactly what MS-BFS exists for: reach of a
set costs the same as reach of one node). The final classification is
vertex-sized left joins — no edge pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.operators.scc import (
    strongly_connected_components,
)
from neo4j_graph_algorithms_spark.operators.wcc import connected_components
from neo4j_graph_algorithms_spark.plans.loop_conf import superstep_conf

__all__ = ["bowtie_decomposition", "reachable_set"]


def reachable_set(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    max_iterations: int = 100,
) -> DataFrame:
    """All node ids reachable from ANY seed (seeds included) —
    multi-source level-synchronous BFS, frontier ∖ visited per level.

    ``seeds`` is a 1-column ``(id)`` DataFrame. The edge side is
    cached pre-partitioned+pre-sorted on ``src`` once, so every level's
    sort-merge join streams it without re-exchange (the PageRank-loop
    discipline, pagerank.py:243-254).
    """
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = (edges.select("src", "dst").repartition(n_part, "src")
         .sortWithinPartitions("src").persist())
    visited = seeds.select("id").distinct().localCheckpoint(eager=True)
    frontier = visited
    with superstep_conf(spark):
        for _ in range(max_iterations):
            nxt = (
                e.join(frontier.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            visited = visited.union(nxt).localCheckpoint(eager=True)
            frontier = nxt
    e.unpersist()
    return visited


def bowtie_decomposition(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_iterations: int = 100,
) -> DataFrame:
    """``(id, bowtie_class)`` per vertex — CORE / IN / OUT / TENDRILS /
    DISCONNECTED relative to the largest SCC (ties between equal-sized
    SCCs broken by smallest component label, deterministically)."""
    e = edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])

    comp = strongly_connected_components(
        vertices, e, max_rounds=max_iterations).components.persist()
    top = (
        comp.groupBy("component").agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.desc("_n"), F.asc("component"))
        .limit(1)
    )
    core = (comp.join(F.broadcast(top), "component", "leftsemi")
            .select("id").localCheckpoint(eager=True))

    fwd = reachable_set(e, core, max_iterations=max_iterations)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    bwd = reachable_set(rev, core, max_iterations=max_iterations)

    wcc = connected_components(
        vertices, e, max_iterations=max_iterations).components
    giant_lbl = (core.join(wcc, "id")
                 .agg(F.min("component").alias("component")))
    in_giant = wcc.join(F.broadcast(giant_lbl), "component", "leftsemi") \
                  .select("id")

    out = (
        vertices.select("id")
        .join(core.withColumn("_core", F.lit(1)), "id", "left")
        .join(fwd.withColumn("_fwd", F.lit(1)), "id", "left")
        .join(bwd.withColumn("_bwd", F.lit(1)), "id", "left")
        .join(in_giant.withColumn("_g", F.lit(1)), "id", "left")
        .select(
            "id",
            F.when(F.col("_core") == 1, F.lit("CORE"))
            .when(F.col("_bwd") == 1, F.lit("IN"))
            .when(F.col("_fwd") == 1, F.lit("OUT"))
            .when(F.col("_g") == 1, F.lit("TENDRILS"))
            .otherwise(F.lit("DISCONNECTED"))
            .alias("bowtie_class"),
        )
    )
    comp.unpersist()
    return out
