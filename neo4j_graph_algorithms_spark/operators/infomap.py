"""InfoMap community detection — PageRank-seeded greedy map-equation
module merging.

Reference procedures re-expressed (SURVEY.md §2.4):
``algo.infoMap[.stream]`` (InfoMapProc.java:45-172,
impl/infomap/InfoMap.java:40-62, an adaption of InfoFlow): seed with
PageRank (damping = 1 − τ), initialize every node as its own module
with ergodic frequency p = pagerank, exit probability
w = p·Σ_t v(s,t) and q = τ·p + (1−τ)·w, then repeatedly merge the
module pair with the lowest (most negative) map-equation change ΔL
(InfoMap.java:278-292) until no merge improves ΔL below −threshold.

Spark restatement: the PageRank seed runs DISTRIBUTED (the existing
operators/pagerank superstep loop — identical scores to the
reference's PageRankAlgorithm at damping 1−τ), and the undirected
normalized-weight module graph is built as DataFrame aggregations.
The merge chain itself is inherently sequential — each of the up-to-n
iterations merges exactly ONE globally-best pair chosen from a full
module scan (the reference runs the same loop in-memory,
InfoMap.java:262-274, with a ForkJoin pool only parallelizing the
scan) — so it replays driver-side over the collected module graph,
guarded by ``max_nodes`` exactly like the sequential DFS operator.

Determinism deviation (documented): the reference iterates module
neighbors in HPPC scatter-map hash order and its ``forEachNeighbor``
aborts the whole scan on the first same-community/visited neighbor
(InfoMap.java:404-421) — order-dependent behavior tied to a hash-map
layout. The restatement scans neighbors in ascending community id and
skips (rather than aborts on) same-community/visited entries, giving a
deterministic merge chain with the same map-equation objective; the
reference's own InfoMapTest invariants (community counts on the 2x3
and 2x4 fixture graphs) are preserved — see tests/test_community_extra.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.operators.pagerank import pagerank

__all__ = ["infomap", "InfoMapResult"]

TAU = 0.15
THRESHOLD = 0.005


@dataclass
class InfoMapResult:
    communities: DataFrame  # (id, community)
    iterations: int
    community_count: int


def _plogp(v: float) -> float:
    return v * math.log2(v) if v > 0.0 else 0.0


def infomap(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    weighted: bool = False,
    pr_iterations: int = 10,
    threshold: float = THRESHOLD,
    tau: float = TAU,
    max_nodes: int = 50_000,
) -> InfoMapResult:
    """(id, community) via greedy map-equation merging.

    ``weighted``: use the ``weight`` column (normalized per source so a
    node's outgoing weights sum to 1, NormalizedRelationshipWeights);
    unweighted uses 1/deg (DegreeNormalizedRelationshipWeights). The
    graph is treated as undirected (the reference loads asUndirected,
    InfoMapTest.java:135).
    """
    # undirected symmetrized view, parallel edges summed
    wcol = (F.col("weight").cast("double") if weighted and
            "weight" in edges.columns else F.lit(1.0))
    e = edges.filter(F.col("src") != F.col("dst")).select(
        "src", "dst", wcol.alias("w"))
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                         "w"))
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
    )
    n = vertices.count()
    if n > max_nodes:
        raise ValueError(
            f"InfoMap's merge chain is sequential (one global best merge "
            f"per iteration, as in the reference); {n} nodes > "
            f"max_nodes={max_nodes}"
        )
    if n < 2:
        return InfoMapResult(
            vertices.select("id", F.col("id").alias("community")), 0, n)

    # distributed PageRank seed at damping 1 - tau (InfoMap.java:126-135)
    pr = pagerank(vertices, sym.select("src", "dst", F.col("w").alias("weight")),
                  damping=1.0 - tau, max_iterations=pr_iterations,
                  weighted=weighted, tol=0.0)
    p_map = {r["id"]: r["rank"] for r in pr.ranks.collect()}

    # normalized weights v(s,t): per-source share of outgoing weight
    tot = sym.groupBy("src").agg(F.sum("w").alias("_tot"))
    norm = sym.join(tot, "src").select(
        "src", "dst", (F.col("w") / F.col("_tot")).alias("v"))
    adj: dict[int, dict[int, float]] = {}
    for r in norm.collect():
        adj.setdefault(r["src"], {})[r["dst"]] = r["v"]

    tau1 = 1.0 - tau
    n1 = n - 1.0

    # module state (Module ctor, InfoMap.java:372-390)
    class _Mod:
        __slots__ = ("index", "n", "p", "w", "q", "nodes", "wi")

        def __init__(self, s: int):
            self.index = s
            self.n = 1
            self.p = p_map.get(s, 0.0)
            w = 0.0
            self.wi: dict[int, float] = {}
            for t, v in adj.get(s, {}).items():
                w += v
                self.wi[t] = (v * self.p
                              + adj.get(t, {}).get(s, 0.0) * p_map.get(t, 0.0))
            self.w = w * self.p
            self.q = tau * self.p + tau1 * self.w
            self.nodes = {s}

        def wil(self, other_index: int) -> float:
            return sum(val for t, val in self.wi.items()
                       if communities[t] == other_index)

    node_ids = sorted(r["id"] for r in vertices.select("id").collect())
    communities = {v: v for v in node_ids}
    modules: dict[int, _Mod] = {v: _Mod(v) for v in node_ids}
    s_qi = sum(m.q for m in modules.values())

    def delta(j: _Mod, k: _Mod, s_qi: float) -> float:
        """ΔL for merging modules j and k (InfoMap.java:281-292)."""
        pi = j.p + k.p
        qi = (tau * pi * (n - (j.n + k.n)) / n1
              + tau1 * (j.w + k.w - j.wil(k.index)))
        return (_plogp(qi - j.q - k.q + s_qi) - _plogp(s_qi)
                - 2 * _plogp(qi) + 2 * _plogp(j.q) + 2 * _plogp(k.q)
                + _plogp(pi + qi) - _plogp(j.p + j.q) - _plogp(k.p + k.q))

    iterations = 0
    while True:
        best_v = -threshold
        best: tuple[_Mod, _Mod] | None = None
        for idx in sorted(modules):
            j = modules[idx]
            seen: set[int] = set()
            for t in sorted(j.wi, key=lambda t: communities[t]):
                c = communities[t]
                if c == j.index or c in seen:
                    continue
                seen.add(c)
                k = modules[c]
                v = delta(j, k, s_qi)
                if v < best_v:
                    best_v = v
                    best = (j, k)
        if best is None:
            break
        j, k = best
        # merge k into j (Module.merge, InfoMap.java:434-459)
        j.n += k.n
        j.p += k.p
        j.w += k.w - j.wil(k.index)
        for node in k.nodes:
            communities[node] = j.index
        j.nodes |= k.nodes
        j.wi.update(k.wi)  # reference putAll: k's values win on collision
        for node in j.nodes:
            j.wi.pop(node, None)
        s_qi -= j.q + k.q
        j.q = tau * j.p * (n - j.n) / n1 + tau1 * j.w
        s_qi += j.q
        del modules[k.index]
        iterations += 1

    spark = vertices.sparkSession
    out = spark.createDataFrame(
        [(int(v), int(c)) for v, c in communities.items()],
        "id long, community long",
    )
    return InfoMapResult(out, iterations, len(modules))
