"""Traversal & shortest-path family as iterative frontier joins.

Reference procedures re-expressed (SURVEY.md §2.4):

- ``algo.bfs.stream`` / ``algo.dfs.stream`` (TraverseProc.java:57-122) →
  :func:`bfs_distances` — level-synchronous BFS: the frontier expands by
  one join per level, visited set accumulated by union+dedup, optional
  ``max_depth`` / target-node early exit. (DFS order is inherently
  sequential; the distance/reachability semantics of the proc are what
  the frontier join reproduces.)
- ``algo.shortestPath[.deltaStepping]`` / ``algo.shortestPaths``
  (ShortestPathDijkstra.java, ShortestPathDeltaStepping.java:72-117,
  ShortestPaths.java) → :func:`sssp` — Bellman-Ford-style iterative
  relaxation: per round every improved vertex relaxes its out-edges
  (``min`` aggregation), terminating when no distance improves — the
  set-oriented equivalent of Δ-stepping's bucket relaxations. Works on
  non-negative weights; unweighted = hop counts.
- ``algo.randomWalk.stream`` (NodeWalkerProc.java:54-66,
  impl/walking/NodeWalker.java) → :func:`random_walks` — per-step
  vectorized sampling: walkers advance one hop per round by sampling an
  out-edge with a deterministic per-(walker, step) hash, entirely with
  JVM expressions (rand-free, reproducible).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["bfs_distances", "sssp", "random_walks"]


def bfs_distances(
    vertices: DataFrame,
    edges: DataFrame,
    source_id: int,
    *,
    max_depth: int | None = None,
) -> DataFrame:
    """(id, distance) for all nodes reachable from ``source_id`` —
    hop-count BFS via level-synchronous frontier joins."""
    dist = vertices.select(
        "id",
        F.when(F.col("id") == source_id, F.lit(0)).otherwise(F.lit(None))
        .cast("long").alias("distance"),
    ).persist()
    frontier = dist.filter(F.col("distance") == 0).select("id")
    depth = 0
    e = edges.select("src", "dst").persist()
    prev = dist
    while True:
        depth += 1
        if max_depth is not None and depth > max_depth:
            break
        nxt = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist.filter(F.col("distance").isNotNull()).select("id"),
                  "id", "left_anti")
        ).persist()
        if nxt.count() == 0:
            nxt.unpersist()
            break
        new_dist = (
            dist.join(nxt.withColumn("_new", F.lit(depth)), "id", "left")
            .select("id", F.coalesce("distance", "_new").alias("distance"))
            .localCheckpoint(eager=True)  # truncate lineage per level
        )
        prev.unpersist()
        prev = new_dist
        dist = new_dist
        frontier = nxt.select("id")
    e.unpersist()
    return dist.filter(F.col("distance").isNotNull())


def sssp(
    vertices: DataFrame,
    edges: DataFrame,
    source_id: int,
    *,
    max_iterations: int = 50,
) -> DataFrame:
    """(id, cost) single-source shortest paths over non-negative
    ``weight`` — iterative relaxation with delta-only frontier (only
    vertices improved last round relax their edges, ≡ Δ-stepping's
    active buckets)."""
    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w")).persist()
    dist = vertices.select(
        "id",
        F.when(F.col("id") == source_id, F.lit(0.0)).otherwise(F.lit(None))
        .cast("double").alias("cost"),
    ).persist()
    frontier = dist.filter(F.col("cost").isNotNull())
    prev = dist
    for _ in range(max_iterations):
        cand = (
            e.join(frontier.withColumnRenamed("id", "src")
                   .withColumnRenamed("cost", "_fc"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("_fc") + F.col("w")).alias("_cand"))
        )
        merged = (
            dist.join(cand, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("_cand").isNotNull()
                    & (F.col("cost").isNull() | (F.col("_cand") < F.col("cost"))),
                    F.col("_cand"),
                ).otherwise(F.col("cost")).alias("cost"),
                (F.col("_cand").isNotNull()
                 & (F.col("cost").isNull() | (F.col("_cand") < F.col("cost")))
                 ).alias("_improved"),
            )
            .localCheckpoint(eager=False)  # truncate lineage per round
        )
        improved = merged.filter(F.col("_improved")).count()
        prev.unpersist()
        prev = merged
        dist = merged.select("id", "cost")
        frontier = merged.filter(F.col("_improved")).select("id", "cost")
        if improved == 0:
            break
    e.unpersist()
    return dist.filter(F.col("cost").isNotNull())


@dataclass
class _WalkState:
    df: DataFrame  # (walk_id, step, node)


def random_walks(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    walks_per_node: int = 1,
    walk_length: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(walk_id, step, node) — fixed-length random walks from every
    vertex, deterministic per (walk, step) via hash-based sampling:
    at each step a walker at u picks out-edge rank
    ``hash(walk_id, step, seed) mod outdeg(u)``. Dead ends stop."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    ranked = edges.select("src", "dst").withColumn(
        "_rk",
        F.row_number().over(W.partitionBy("src").orderBy("dst")) - 1,
    ).join(deg, "src").persist()
    ranked.count()

    starts = vertices.select("id").crossJoin(
        F.broadcast(
            vertices.sparkSession.range(walks_per_node).select(
                F.col("id").alias("_w"))
        )
    ).select(
        (F.col("id") * walks_per_node + F.col("_w")).alias("walk_id"),
        F.lit(0).alias("step"),
        F.col("id").alias("node"),
    )
    out = starts.persist()
    cur = starts
    for step in range(1, walk_length + 1):
        pick = F.pmod(
            F.hash(F.col("walk_id"), F.lit(step), F.lit(seed)), F.col("_deg")
        )
        nxt = (
            cur.join(ranked.withColumnRenamed("src", "node"), "node")
            .filter(F.col("_rk") == pick)
            .select("walk_id", F.lit(step).alias("step"),
                    F.col("dst").alias("node"))
        ).localCheckpoint(eager=False)
        nxt.count()
        out = out.union(nxt)
        cur = nxt
    return out
