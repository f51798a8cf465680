"""Yen's k shortest loopless paths — ``algo.kShortestPaths``.

Reference procedures re-expressed (SURVEY.md §2.4):
``algo.kShortestPaths[.stream]`` (KShortestPathsProc.java:69-136,
impl/yens/YensKShortestPaths.java): the classic Yen construction —
A[0] is the plain shortest path; each next path is the cheapest
"spur" candidate, where a spur at position i of a previous path
removes (a) the outgoing edges used by any accepted path sharing the
same root prefix and (b) the root's interior nodes, then runs a
shortest-path search from the spur node to the target.

Spark restatement: every spur search IS the engine's distributed
:func:`~neo4j_graph_algorithms_spark.operators.traversal.shortest_path`
(SSSP relaxation + pointer-doubling path recovery) over a filtered
edge view — removals are DataFrame filters, never mutations, so the
base edge table is scanned with predicate pushdown each probe. The
candidate bookkeeping (≤ k·|path| tiny tuples) lives driver-side,
exactly like the reference's candidate priority queue
(YensKShortestPaths.java uses an in-memory limited min-max heap).

Single-pair regime: cost is O(k · |A[k]| ) spur searches; each search
is distributed, so the operator scales with the graph, while k and
path length stay interactive-sized (as in the reference).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.operators.traversal import shortest_path

__all__ = ["k_shortest_paths", "KShortestPathsResult"]


@dataclass
class KShortestPathsResult:
    paths: DataFrame      # (path_index, step, id, path_cost)
    path_count: int


def _collect_path(df: DataFrame) -> tuple[list[int], list[float]] | None:
    """(nodes, cumulative costs) of a shortest_path result (tiny)."""
    rows = df.orderBy("step").collect()
    if not rows:
        return None
    return [int(r["id"]) for r in rows], [float(r["cost"]) for r in rows]


def k_shortest_paths(
    vertices: DataFrame,
    edges: DataFrame,
    source_id: int,
    target_id: int,
    k: int,
    *,
    max_iterations: int = 50,
) -> KShortestPathsResult:
    """Top-k loopless shortest paths source→target by total weight
    (ties broken by discovery order, matching Yen's construction)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = vertices.sparkSession
    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    base = edges.select("src", "dst", w.alias("weight"))

    first = _collect_path(
        shortest_path(vertices, base, source_id, target_id,
                      max_iterations=max_iterations))
    accepted: list[tuple[list[int], list[float]]] = []
    if first is not None:
        accepted.append(first)
    candidates: list[tuple[float, list[int], list[float]]] = []
    seen: set[tuple[int, ...]] = {tuple(first[0])} if first else set()

    while first is not None and len(accepted) < k:
        prev_path, prev_cum = accepted[-1]
        for i in range(len(prev_path) - 1):
            root = prev_path[: i + 1]
            spur = root[-1]
            # (a) drop the next edge of every accepted path sharing root
            banned_edges = {
                (p[i], p[i + 1])
                for p, _ in accepted
                if len(p) > i + 1 and p[: i + 1] == root
            }
            # (b) drop interior root nodes entirely (loopless invariant)
            banned_nodes = set(root[:-1])
            cond = F.lit(True)
            for (a, b) in banned_edges:
                cond = cond & ~((F.col("src") == a) & (F.col("dst") == b))
            if banned_nodes:
                bn = list(banned_nodes)
                cond = cond & ~F.col("src").isin(bn) & ~F.col("dst").isin(bn)
            sub_v = vertices.filter(~F.col("id").isin(list(banned_nodes))) \
                if banned_nodes else vertices
            res = _collect_path(
                shortest_path(sub_v, base.filter(cond), spur, target_id,
                              max_iterations=max_iterations))
            if res is None:
                continue
            spur_path, spur_cum = res
            root_cost = prev_cum[i]
            cand = root[:-1] + spur_path
            cand_cum = prev_cum[:i] + [root_cost + c for c in spur_cum]
            key = tuple(cand)
            if key not in seen:
                seen.add(key)
                candidates.append((cand_cum[-1], cand, cand_cum))
        if not candidates:
            break
        candidates.sort(key=lambda t: (t[0], t[1]))
        _, path, cum = candidates.pop(0)
        accepted.append((path, cum))

    rows = []
    for pi, (path, cum) in enumerate(accepted):
        for step, node in enumerate(path):
            rows.append((pi, step, node, float(cum[-1])))
    out = spark.createDataFrame(
        rows, "path_index int, step int, id long, path_cost double")
    return KShortestPathsResult(out, len(accepted))
