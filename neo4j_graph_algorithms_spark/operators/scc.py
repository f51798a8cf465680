"""Strongly connected components — iterative coloring / forward-backward.

Reference procedures re-expressed (SURVEY.md §2.4):
``algo.scc[.stream]`` and variants (StronglyConnectedComponentsProc.java:
68-434; impl/scc/* Tarjan family, impl/multistepscc/* coloring+FWBW).
Tarjan's stack discipline is inherently sequential, so the distributed
restatement is the reference's **multistep** path
(impl/multistepscc/MultistepSCC.java): iterate

1. *color propagation*: every node starts colored with its own id;
   colors propagate forward along out-edges taking the max until
   fixpoint (≡ MultistepSCC coloring phase);
2. *backward sweep*: from each color root r (the node whose id == its
   color), BFS along reversed edges restricted to nodes of color r —
   those reached form exactly SCC(r) (the classic ColorSCC argument:
   anything in r's color is forward-reachable from r);
3. peel the finished SCCs off and repeat on the remainder.

Trivial SCCs are pre-trimmed (nodes with no in- or out-edges within the
remaining set — the reference's trim phase) which removes the long tail
of singletons in web graphs before any iteration.

Output component ids are canonicalized to the **minimum member id**
(same deterministic convention as WCC — the reference emits internal
root ids and its tests assert partition equivalence only).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F

__all__ = ["strongly_connected_components", "SccResult"]


@dataclass
class SccResult:
    components: DataFrame  # (id: long, component: long)
    rounds: int
    metrics: list[dict[str, Any]] = field(default_factory=list)


def strongly_connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_rounds: int = 50,
) -> SccResult:
    """(id, component = min member id) for every vertex."""
    nodes = vertices.select("id").localCheckpoint(eager=True)
    e_all = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    results: list[DataFrame] = []
    rounds = 0
    e = e_all
    while not nodes.isEmpty() and rounds < max_rounds:
        rounds += 1
        # trim trivial SCCs
        while True:
            has_out = e.select(F.col("src").alias("id")).distinct()
            has_in = e.select(F.col("dst").alias("id")).distinct()
            keep = (
                nodes.join(has_out, "id", "left_semi")
                .join(has_in, "id", "left_semi")
                .localCheckpoint(eager=True)
            )
            trimmed = nodes.join(keep, "id", "left_anti")
            if trimmed.isEmpty():
                break
            results.append(
                trimmed.select("id", F.col("id").alias("component"))
                .localCheckpoint(eager=True)
            )
            nodes = keep
            e = (
                e.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
        if nodes.isEmpty():
            break
        # 1. forward max-color propagation to fixpoint
        colors = nodes.select("id", F.col("id").alias("color"))
        while True:
            pushed = (
                e.join(colors.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("color").alias("_cmax"))
            )
            new_colors = (
                colors.join(pushed, "id", "left")
                .select(
                    "id",
                    F.greatest(
                        F.col("color"), F.coalesce("_cmax", F.col("color"))
                    ).alias("color"),
                    F.col("color").alias("_prev"),
                )
                .localCheckpoint(eager=True)
            )
            changed = new_colors.filter(F.col("color") != F.col("_prev")).count()
            colors = new_colors.select("id", "color")
            if changed == 0:
                break
        # 2. backward BFS from each root within its color — multi-source,
        # all colors at once: frontier (color, id) starting at roots.
        roots = colors.filter(F.col("id") == F.col("color"))
        member = roots.select("color", "id").localCheckpoint(eager=True)
        frontier = member
        e_rev_colored = (
            e.join(colors.withColumnRenamed("id", "src")
                   .withColumnRenamed("color", "_csrc"), "src")
            .join(colors.withColumnRenamed("id", "dst")
                  .withColumnRenamed("color", "_cdst"), "dst")
            .filter(F.col("_csrc") == F.col("_cdst"))
            .select(F.col("dst").alias("from"), F.col("src").alias("to"),
                    F.col("_csrc").alias("color"))
            .localCheckpoint(eager=True)
        )
        while True:
            nxt = (
                e_rev_colored.join(
                    frontier.withColumnRenamed("id", "from"), ["color", "from"]
                )
                .select("color", F.col("to").alias("id"))
                .distinct()
                .join(member, ["color", "id"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            member = member.union(nxt).localCheckpoint(eager=True)
            frontier = nxt
        scc = member.groupBy("color").agg(F.min("id").alias("component")).join(
            member, "color"
        ).select("id", "component").localCheckpoint(eager=True)
        results.append(scc)
        finished = scc.select("id")
        nodes = nodes.join(finished, "id", "left_anti").localCheckpoint(eager=True)
        e = (
            e.join(nodes.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(nodes.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    if not nodes.isEmpty():  # max_rounds hit — remaining nodes singleton
        results.append(nodes.select("id", F.col("id").alias("component")))
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return SccResult(out, rounds)
