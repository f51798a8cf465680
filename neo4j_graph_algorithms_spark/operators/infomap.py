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

__all__ = ["infomap", "infomap_fixed_merges", "InfoMapResult"]

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


def infomap_fixed_merges(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    n_merges: int = 8,
    weighted: bool = False,
    pr_iterations: int = 10,
    threshold: float = THRESHOLD,
    tau: float = TAU,
    max_nodes: int = 50_000,
) -> InfoMapResult:
    """Deterministic fixed-merge-count InfoMap — the oracle-checkable
    mirror of :func:`infomap` (same pattern as ``louvain_onelevel``).

    Up to ``n_merges`` merges; each picks the map-equation argmin
    (InfoMap.java:281-292, the same ΔL objective) over module stats
    recomputed as *pure functions of the current community assignment*
    — p_i/n_i are per-module sums, w_i is the module's exit flow
    Σ v(s,t)·p(s) over cross-module edges — instead of the reference's
    incrementally-maintained per-module ``wi`` neighbor map (whose
    putAll-collision quirk, InfoMap.java:452-455, is not
    SQL-replayable). ΔL is rounded to 9 dp before comparison, ties
    break ascending on (ΔL, c_j, c_k) with pairs canonicalized
    c_j < c_k, and the higher community id merges into the lower; a
    step with no candidate below ``−threshold`` stops the chain. The
    PageRank seed (damping 1−τ) runs DISTRIBUTED exactly as in
    :func:`infomap`; the merge replay is driver-side over the
    ``max_nodes``-guarded module graph, as is the reference's own
    sequential loop (InfoMap.java:262-274).
    """
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
            f"InfoMap's merge chain is sequential; {n} nodes > "
            f"max_nodes={max_nodes}"
        )
    if n < 2:
        return InfoMapResult(
            vertices.select("id", F.col("id").alias("community")), 0, n)

    pr = pagerank(vertices,
                  sym.select("src", "dst", F.col("w").alias("weight")),
                  damping=1.0 - tau, max_iterations=pr_iterations,
                  weighted=weighted, tol=0.0)
    p_map = {r["id"]: r["rank"] for r in pr.ranks.collect()}

    tot = sym.groupBy("src").agg(F.sum("w").alias("_tot"))
    norm_rows = [
        (r["src"], r["dst"], r["v"])
        for r in sym.join(tot, "src").select(
            "src", "dst", (F.col("w") / F.col("_tot")).alias("v")).collect()
    ]
    node_ids = sorted(r["id"] for r in vertices.select("id").collect())

    tau1 = 1.0 - tau
    n1 = n - 1.0
    comm = {v: v for v in node_ids}
    merges = 0
    for _ in range(max(0, n_merges)):
        p_mod: dict[int, float] = {}
        n_mod: dict[int, int] = {}
        for v_id in node_ids:
            c = comm[v_id]
            p_mod[c] = p_mod.get(c, 0.0) + p_map.get(v_id, 0.0)
            n_mod[c] = n_mod.get(c, 0) + 1
        w_mod: dict[int, float] = {}
        flow: dict[tuple[int, int], float] = {}
        for s, t, v in norm_rows:
            cs, ct = comm[s], comm[t]
            if cs == ct:
                continue
            contrib = v * p_map.get(s, 0.0)
            w_mod[cs] = w_mod.get(cs, 0.0) + contrib
            key = (cs, ct) if cs < ct else (ct, cs)
            flow[key] = flow.get(key, 0.0) + contrib
        q_mod = {
            c: tau * p_mod[c] * (n - n_mod[c]) / n1
            + tau1 * w_mod.get(c, 0.0)
            for c in p_mod
        }
        s_q = sum(q_mod.values())
        best: tuple[float, int, int] | None = None
        for (cj, ck), wjk in flow.items():
            pi = p_mod[cj] + p_mod[ck]
            ni = n_mod[cj] + n_mod[ck]
            qi = (tau * pi * (n - ni) / n1
                  + tau1 * (w_mod.get(cj, 0.0) + w_mod.get(ck, 0.0) - wjk))
            dl = (_plogp(qi - q_mod[cj] - q_mod[ck] + s_q) - _plogp(s_q)
                  - 2 * _plogp(qi) + 2 * _plogp(q_mod[cj])
                  + 2 * _plogp(q_mod[ck])
                  + _plogp(pi + qi) - _plogp(p_mod[cj] + q_mod[cj])
                  - _plogp(p_mod[ck] + q_mod[ck]))
            dlr = round(dl, 9)
            if dlr < -threshold:
                cand = (dlr, cj, ck)
                if best is None or cand < best:
                    best = cand
        if best is None:
            break
        _, cj, ck = best
        for v_id in node_ids:
            if comm[v_id] == ck:
                comm[v_id] = cj
        merges += 1

    spark = vertices.sparkSession
    out = spark.createDataFrame(
        [(int(v), int(c)) for v, c in comm.items()],
        "id long, community long",
    )
    return InfoMapResult(out, merges, len(set(comm.values())))
