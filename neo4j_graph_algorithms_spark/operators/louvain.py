"""Louvain community detection — synchronous modularity optimization
with graph coarsening.

Reference procedures re-expressed (SURVEY.md §2.4):
``algo.louvain[.stream]`` (LouvainProc.java:67-133;
impl/louvain/Louvain.java, ModularityOptimization.java): repeated
levels of (1) local modularity-optimizing label moves and (2) coarsening
the graph by communities, producing a dendrogram of per-level labels and
per-level modularity scores.

The reference's move phase is asynchronous over a shared labels array
(ModularityOptimization.java) — nondeterministic under concurrency, like
LabelPropagation. The Spark restatement is **synchronous** rounds with a
deterministic tie-break (max gain, then min community id), the same
documented deviation as LPA (SURVEY.md §2.3): per round every node
evaluates the standard gain

    ΔQ(v→c) = k_{v,in}(c)/m  −  γ·k_v·Σ_tot(c)/(2m²)

over its neighbor communities (self-community compared with v removed
from it) and moves to the argmax when positive. Oscillation (two nodes
swapping forever, a classic synchronous-update artifact) is broken by a
red/black parity schedule: even-id nodes move on even rounds, odd-id
nodes on odd rounds. When a level converges (no move), communities
collapse into super-nodes (edge weights summed, intra-community weight
kept as self-loops) and the next level starts.

Output labels are canonicalized to min ORIGINAL member id per community;
modularity per level is reported.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["louvain", "louvain_one_level", "louvain_two_level",
           "modularity", "LouvainResult"]


@dataclass
class LouvainResult:
    communities: DataFrame        # (id, community) — final level, canonical
    dendrogram: list[DataFrame]   # (id, community) per level (original ids)
    modularities: list[float]
    levels: int
    iterations: list[int] = field(default_factory=list)


def _sym_weighted(edges: DataFrame) -> DataFrame:
    """Symmetrized weighted edges (undirected view, both directions),
    parallel AND reciprocal directed edges summed (matching the
    reference's undirected SUM dedup strategy — a→b w1 plus b→a w2
    becomes undirected weight w1+w2); self-loops preserved once."""
    w = F.col("weight").cast("double") if "weight" in edges.columns else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("weight"))
    e = e.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    rev = e.filter(F.col("src") != F.col("dst")).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    return e.union(rev).groupBy("src", "dst").agg(
        F.sum("weight").alias("weight")
    )


def modularity(edges_sym: DataFrame, labels: DataFrame, *,
               gamma: float = 1.0) -> float:
    """Q = Σ_c [ in_c/(2m) − γ·(tot_c/(2m))² ] over the symmetrized view
    (in_c counts both directions; self-loops count 2·w toward in_c)."""
    lab = labels.select(F.col("id").alias("src"), F.col("community").alias("_cs"))
    lab2 = labels.select(F.col("id").alias("dst"), F.col("community").alias("_cd"))
    e = edges_sym.join(lab, "src").join(lab2, "dst")
    two_m = e.agg(
        F.sum(F.when(F.col("src") == F.col("dst"),
                     2.0 * F.col("weight")).otherwise(F.col("weight")))
    ).first()[0]
    if not two_m:
        return 0.0
    per_c = (
        e.groupBy("_cs").agg(
            F.sum(F.when(F.col("_cs") == F.col("_cd"),
                         F.when(F.col("src") == F.col("dst"),
                                2.0 * F.col("weight"))
                         .otherwise(F.col("weight")))
                  .otherwise(F.lit(0.0))).alias("in_c"),
            F.sum(F.when(F.col("src") == F.col("dst"),
                         2.0 * F.col("weight")).otherwise(F.col("weight")))
            .alias("tot_c"),
        )
    )
    # explicit product, not **2: Math.pow(x, 2) is not guaranteed
    # bit-equal to x*x, and the DuckDB oracle multiplies
    ratio = F.col("tot_c") / two_m
    row = per_c.agg(
        F.sum(F.col("in_c") / two_m - F.lit(gamma) * (ratio * ratio))
    ).first()
    return float(row[0] or 0.0)


def _one_level_local(node_ids, edge_rows, *, gamma: float,
                     max_moves: int) -> tuple[dict, int]:
    """Driver-side twin of :func:`_one_level` with IDENTICAL semantics
    (synchronous parity-scheduled rounds, same gain formula, same
    move-if-better-than-stay rule, same min-community tie-break).

    Used when the level's graph fits the driver comfortably — always
    true for coarsened levels (nodes = communities of the level below)
    and for small inputs. Eliminates ~8 Spark jobs per round; the
    distributed path remains for web-scale level-1 graphs.
    """
    from collections import defaultdict

    adj: dict[int, dict[int, float]] = defaultdict(dict)
    k = defaultdict(float)
    two_m = 0.0
    for s, d, w in edge_rows:
        if s == d:
            k[s] += 2.0 * w
            two_m += 2.0 * w
        else:
            adj[s][d] = adj[s].get(d, 0.0) + w
            k[s] += w
            two_m += w
    labels = {int(v): int(v) for v in node_ids}
    if two_m == 0.0:
        return labels, 0
    m = two_m / 2.0
    tot = defaultdict(float)
    for v in labels:
        tot[labels[v]] += k[v]
    rounds = 0
    quiet = 0
    for r in range(max_moves):
        rounds = r + 1
        moved = 0
        # synchronous: decisions against the PREVIOUS state
        prev_labels = dict(labels)
        prev_tot = dict(tot)
        for v in sorted(prev_labels):
            if v % 2 != r % 2:
                continue
            votes = defaultdict(float)
            for u, w in adj.get(v, {}).items():
                votes[prev_labels[u]] += w
            if not votes:
                continue
            own = prev_labels[v]

            def gain(c):
                tc = prev_tot.get(c, 0.0)
                if c == own:
                    tc -= k[v]
                return votes.get(c, 0.0) / m - gamma * k[v] * tc / (m * two_m)

            best = min(votes, key=lambda c: (-gain(c), c))
            # distributed twin: the stay-gain is only defined when the
            # node has an edge into its own community (scored rows come
            # from votes); otherwise it coalesces to 0.0
            stay_g = gain(own) if own in votes else 0.0
            if best != own and gain(best) > stay_g + 1e-12:
                labels[v] = best
                tot[own] -= k[v]
                tot[best] += k[v]
                moved += 1
        # fixpoint = two consecutive quiet rounds (one per parity) —
        # a single quiet odd round does not prove the even parity is done
        quiet = quiet + 1 if moved == 0 else 0
        if quiet >= 2:
            break
    return labels, rounds


# coarsened levels (and small inputs) run driver-side below this many nodes
LOCAL_LEVEL_THRESHOLD = 50_000


def _one_level(nodes: DataFrame, edges_sym: DataFrame, *,
               gamma: float, max_moves: int) -> tuple[DataFrame, int]:
    """Modularity-optimizing moves until fixpoint on one level.
    Returns (labels(id, community), rounds_run). ``edges_sym`` must be
    the symmetrized view; self-loops excluded from neighbor votes."""
    e = edges_sym.filter(F.col("src") != F.col("dst")).persist()
    # k_v: weighted degree incl. self-loops counted twice
    self_w = edges_sym.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("id"), (2.0 * F.col("weight")).alias("_sw"))
    kv = (
        e.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("_k"))
        .join(self_w, "id", "left")
        .select("id", (F.col("_k") + F.coalesce("_sw", F.lit(0.0))).alias("k"))
    )
    kv = nodes.select("id").join(kv, "id", "left").select(
        "id", F.coalesce("k", F.lit(0.0)).alias("k")).persist()
    two_m = edges_sym.agg(
        F.sum(F.when(F.col("src") == F.col("dst"),
                     2.0 * F.col("weight")).otherwise(F.col("weight")))
    ).first()[0] or 0.0
    if two_m == 0.0:
        return nodes.select("id", F.col("id").alias("community")), 0

    labels = nodes.select("id", F.col("id").alias("community"))
    rounds = 0
    quiet = 0
    for r in range(max_moves):
        rounds = r + 1
        lab_dst = labels.select(F.col("id").alias("dst"),
                                F.col("community").alias("_cn"))
        # votes: total edge weight from v to each neighbor community
        votes = (
            e.join(lab_dst, "dst")
            .groupBy(F.col("src").alias("id"), F.col("_cn").alias("cand"))
            .agg(F.sum("weight").alias("k_in"))
        )
        # Σ_tot per community
        tot = (
            labels.join(kv, "id")
            .groupBy("community").agg(F.sum("k").alias("tot"))
        )
        cur = labels.join(kv, "id")
        scored = (
            votes.join(cur, "id")
            .join(tot.withColumnRenamed("community", "cand")
                  .withColumnRenamed("tot", "_tot_c"), "cand")
            # Σ_tot of candidate community with v removed if it's v's own
            .withColumn(
                "_tot_adj",
                F.when(F.col("cand") == F.col("community"),
                       F.col("_tot_c") - F.col("k")).otherwise(F.col("_tot_c")),
            )
            .withColumn(
                "gain",
                F.col("k_in") / F.lit(two_m / 2.0)
                - F.lit(gamma) * F.col("k") * F.col("_tot_adj")
                / F.lit((two_m / 2.0) * two_m),
            )
        )
        pick = scored.withColumn(
            "_rk",
            F.row_number().over(
                W.partitionBy("id").orderBy(F.desc("gain"), F.asc("cand"))
            ),
        ).filter(F.col("_rk") == 1)
        # move only when strictly positive vs staying, parity-scheduled
        stay = scored.filter(F.col("cand") == F.col("community")).select(
            "id", F.col("gain").alias("_stay"))
        moves = (
            pick.join(stay, "id", "left")
            .filter(
                (F.col("cand") != F.col("community"))
                & (F.col("gain") > F.coalesce("_stay", F.lit(0.0)) + 1e-12)
                & (F.pmod(F.col("id"), F.lit(2)) == F.lit(r % 2))
            )
            .select("id", F.col("cand").alias("_new"))
        )
        moves = moves.localCheckpoint(eager=True)
        n_moves = moves.count()
        labels = (
            labels.join(moves, "id", "left")
            .select("id", F.coalesce("_new", F.col("community")).alias("community"))
            .localCheckpoint(eager=True)
        )
        # fixpoint = two CONSECUTIVE quiet rounds (one per parity)
        quiet = quiet + 1 if n_moves == 0 else 0
        if quiet >= 2:
            break
    e.unpersist()
    kv.unpersist()
    return labels, rounds


def louvain_one_level(vertices: DataFrame, edges: DataFrame, *,
                      rounds: int, gamma: float = 1.0) -> DataFrame:
    """One Louvain level, at most ``rounds`` parity-scheduled move
    rounds — (id, community) with raw (initial = own-id) labels.

    Every round is a deterministic function of the previous labels
    (gain arithmetic over integer-valued doubles, max-gain/min-community
    tie-break, red/black parity), so a fixed ``rounds`` makes the whole
    operator SQL-expressible: the driver oracle unrolls each round as
    votes → Σ_tot → gains → argmax → moves MATERIALIZED CTEs. Early
    convergence (two consecutive quiet rounds) leaves labels unchanged,
    identical to running the remaining unrolled rounds on a fixpoint."""
    sym = _sym_weighted(edges)
    labels, _ = _one_level(vertices, sym, gamma=gamma, max_moves=rounds)
    return labels


def louvain_two_level(vertices: DataFrame, edges: DataFrame, *,
                      rounds1: int, rounds2: int,
                      gamma: float = 1.0) -> DataFrame:
    """Two fixed-rounds Louvain levels with coarsening in between —
    (id, community) canonicalized to min ORIGINAL member id.

    The oracle-checkable mirror of the multi-level :func:`louvain`
    coarsening path (Louvain.java:32-43): level 1 runs exactly
    ``rounds1`` parity-scheduled move rounds, communities collapse into
    super-nodes (edge weights summed, intra-community weight kept as
    self-loops, the same 2m-invariant bookkeeping as :func:`louvain`),
    level 2 runs ``rounds2`` rounds on the coarse graph, and the
    result projects back to original ids. Every step is a deterministic
    function of the previous labels over integer-valued doubles
    (unit-weight sums stay exact in IEEE double through coarsening:
    intra-community flows appear in both symmetrized directions so the
    self-loop halving is exact), so the whole operator unrolls to SQL
    (`_louvain_twolevel_sql`)."""
    sym = _sym_weighted(edges).persist()
    sym.count()
    lab1, _ = _one_level(vertices, sym, gamma=gamma, max_moves=rounds1)
    lab_s = lab1.select(F.col("id").alias("src"),
                        F.col("community").alias("_cs"))
    lab_d = lab1.select(F.col("id").alias("dst"),
                        F.col("community").alias("_cd"))
    coarse = (
        sym.join(lab_s, "src").join(lab_d, "dst")
        .groupBy(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
        .agg(F.sum(
            F.when(F.col("src") == F.col("dst"), 2.0 * F.col("weight"))
            .otherwise(F.col("weight"))
        ).alias("weight"))
        .withColumn(
            "weight",
            F.when(F.col("src") == F.col("dst"), F.col("weight") / 2.0)
            .otherwise(F.col("weight")),
        )
        .localCheckpoint(eager=True)
    )
    cnodes = lab1.select(F.col("community").alias("id")).distinct()
    lab2, _ = _one_level(cnodes, coarse, gamma=gamma, max_moves=rounds2)
    mapping = (
        lab1.join(
            lab2.withColumnRenamed("community", "_new")
            .withColumnRenamed("id", "community"),
            "community",
        )
        .select("id", F.col("_new").alias("community"))
    )
    canon = (
        mapping.groupBy("community").agg(F.min("id").alias("_canon"))
        .join(mapping, "community")
        .select("id", F.col("_canon").alias("community"))
    )
    canon = canon.localCheckpoint(eager=True)
    sym.unpersist()
    return canon


def louvain(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    gamma: float = 1.0,
    max_levels: int = 5,
    max_moves_per_level: int = 20,
) -> LouvainResult:
    """Multi-level Louvain. ``communities``: (id, community=min member
    original id) at the final level."""
    sym = _sym_weighted(edges).persist()
    sym.count()
    # mapping original id → current community (in current-level id space)
    mapping = vertices.select("id", F.col("id").alias("community"))
    cur_nodes = vertices.select("id")
    cur_edges = sym
    dendrogram: list[DataFrame] = []
    modularities: list[float] = []
    iters: list[int] = []

    spark = vertices.sparkSession
    for _level in range(max_levels):
        n_cur = cur_nodes.count()
        if (n_cur <= LOCAL_LEVEL_THRESHOLD
                and cur_edges.count() <= 40 * LOCAL_LEVEL_THRESHOLD):
            ids = [r["id"] for r in cur_nodes.collect()]
            rows = [(r["src"], r["dst"], r["weight"])
                    for r in cur_edges.collect()]
            lab_map, rounds = _one_level_local(
                ids, rows, gamma=gamma, max_moves=max_moves_per_level
            )
            labels = spark.createDataFrame(
                [(int(v), int(c)) for v, c in lab_map.items()],
                "id long, community long",
            )
        else:
            labels, rounds = _one_level(
                cur_nodes, cur_edges, gamma=gamma, max_moves=max_moves_per_level
            )
        iters.append(rounds)
        # project to original ids
        mapping = (
            mapping.join(
                labels.withColumnRenamed("community", "_new")
                .withColumnRenamed("id", "community"),
                "community",
            )
            .select("id", F.col("_new").alias("community"))
            .localCheckpoint(eager=True)
        )
        canon = (
            mapping.groupBy("community").agg(F.min("id").alias("_canon"))
            .join(mapping, "community")
            .select("id", F.col("_canon").alias("community"))
            .localCheckpoint(eager=True)
        )
        dendrogram.append(canon)
        modularities.append(modularity(sym, canon, gamma=gamma))
        n_comms = labels.select("community").distinct().count()
        n_nodes = cur_nodes.count()
        if n_comms == n_nodes:
            break
        # coarsen: communities → super-nodes, weights summed; intra-
        # community weight becomes a self-loop (symmetrized view keeps
        # both directions, so the self-loop weight is w_intra/… kept as
        # the summed directed view once per (c,c))
        lab_s = labels.select(F.col("id").alias("src"), F.col("community").alias("_cs"))
        lab_d = labels.select(F.col("id").alias("dst"), F.col("community").alias("_cd"))
        # 2m bookkeeping for the (c,c) group: cross intra edges appear in
        # BOTH directions of the symmetrized view (contribute w per
        # direction), while an inherited self-loop (src==dst) appears
        # once but counts 2w toward 2m — weight it double before the /2
        # so 2m is invariant across levels (a plain sum/2 halves
        # inherited self-loops every level).
        coarse = (
            cur_edges.join(lab_s, "src").join(lab_d, "dst")
            .groupBy(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
            .agg(F.sum(
                F.when(F.col("src") == F.col("dst"), 2.0 * F.col("weight"))
                .otherwise(F.col("weight"))
            ).alias("weight"))
        )
        cur_edges = coarse.withColumn(
            "weight",
            F.when(F.col("src") == F.col("dst"), F.col("weight") / 2.0)
            .otherwise(F.col("weight")),
        ).localCheckpoint(eager=True)
        cur_nodes = labels.select(F.col("community").alias("id")).distinct() \
            .localCheckpoint(eager=True)

    final = dendrogram[-1] if dendrogram else vertices.select(
        "id", F.col("id").alias("community"))
    sym.unpersist()
    return LouvainResult(final, dendrogram, modularities, len(dendrogram), iters)
