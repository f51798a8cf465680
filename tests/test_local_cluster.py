"""Sweep cut / PPR-Nibble, Katz centrality, per-community conductance,
and the distributed ranked-prefix-sum helper — all verified against
in-memory brute-force replays.
"""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.centrality_variants import (
    katz_centrality,
)
from neo4j_graph_algorithms_spark.operators.local_cluster import (
    ppr_local_cluster,
    sweep_cut,
)
from neo4j_graph_algorithms_spark.operators.metrics import (
    community_conductance,
)
from neo4j_graph_algorithms_spark.plans.ranking import ranked_prefix_sums


def _clique(ids):
    return [(a, b) for a in ids for b in ids if a < b]


def _brute_sweep(und, scores):
    """In-memory ACL sweep: und = set of (a<b) pairs, scores = {id: s>0
    support}. Returns [(pos, id, vol, cut, cond)]."""
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m2 = 2 * len(und)
    order = sorted(scores, key=lambda i: (-scores[i] / deg[i], i))
    out, inset = [], set()
    for pos, v in enumerate(order, 1):
        inset.add(v)
        vol = sum(deg[x] for x in inset)
        cut = sum(1 for a, b in und if (a in inset) != (b in inset))
        den = min(vol, m2 - vol)
        if den > 0:
            out.append((pos, v, vol, cut, round(cut / den, 6)))
    return out


def test_sweep_cut_matches_bruteforce_two_cliques(spark):
    a, b = [0, 1, 2, 3], [4, 5, 6, 7]
    und = _clique(a) + _clique(b) + [(3, 4)]  # bridge
    edges = spark.createDataFrame(und, "src long, dst long")
    scores = {0: 0.4, 1: 0.3, 2: 0.2, 3: 0.1}  # support = clique A
    sdf = spark.createDataFrame(list(scores.items()), "id long, score double")
    got = sorted(
        sweep_cut(edges, sdf, num_partitions=3).collect(),
        key=lambda r: r["pos"],
    )
    want = _brute_sweep(set(und), scores)
    assert [(r["pos"], r["id"], r["vol"], r["cut"]) for r in got] == [
        w[:4] for w in want
    ]
    for r, w in zip(got, want):
        assert r["conductance"] == pytest.approx(w[4], abs=1e-9)
    # the full clique-A prefix is the best cut: one bridge / vol 13
    best = min(got, key=lambda r: (r["conductance"], r["pos"]))
    assert best["pos"] == 4 and best["cut"] == 1
    assert best["conductance"] == pytest.approx(round(1 / 13, 6))


def test_sweep_cut_random_graph_bruteforce(spark):
    rng = random.Random(7)
    n = 30
    und = {(a, b) for a in range(n) for b in range(a + 1, n)
           if rng.random() < 0.15}
    und |= {(i, i + 1) for i in range(n - 1)}  # connected
    scores = {i: rng.random() for i in range(n) if rng.random() < 0.5}
    scores = {i: s for i, s in scores.items() if s > 0}
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in list(und)[:5]],
        "src long, dst long",  # a few reversed dupes — must be deduped
    )
    sdf = spark.createDataFrame(list(scores.items()), "id long, score double")
    got = sorted(sweep_cut(edges, sdf, num_partitions=4).collect(),
                 key=lambda r: r["pos"])
    want = _brute_sweep(und, scores)
    assert [(r["pos"], r["id"], r["vol"], r["cut"]) for r in got] == [
        w[:4] for w in want]
    for r, w in zip(got, want):
        assert r["conductance"] == pytest.approx(w[4], abs=1e-9)


def test_ppr_local_cluster_finds_seed_clique(spark):
    a, b = [0, 1, 2, 3], [4, 5, 6, 7]
    und = _clique(a) + _clique(b) + [(3, 4)]
    # directed input: both directions so PPR can flow
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(8)], "id long")
    res = ppr_local_cluster(verts, edges, [0], max_iterations=8)
    members = {r["id"] for r in
               res.sweep.filter(F.col("pos") <= res.best_size).collect()}
    assert members == set(a)
    assert res.best_conductance == pytest.approx(round(1 / 13, 6))


def test_katz_matches_numpy(spark):
    rng = random.Random(3)
    n = 25
    pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(150)}
    pairs = {(s, d) for s, d in pairs if s != d}
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = 1.0
    alpha, beta, iters = 0.05, 1.0, 12
    x = np.full(n, beta)
    for _ in range(iters):
        x = beta + alpha * (A.T @ x)
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    res = katz_centrality(verts, edges, alpha=alpha, beta=beta,
                          max_iterations=iters)
    got = {r["id"]: r["score"] for r in res.scores.collect()}
    assert res.iterations == iters
    for i in range(n):
        assert got[i] == pytest.approx(x[i], rel=1e-12)


def test_katz_tolerance_converges(spark):
    # star: center 0 <- leaves; alpha*deg < 1 so the series converges
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(6)], "id long")
    res = katz_centrality(verts, edges, alpha=0.1, beta=1.0,
                          max_iterations=50, tol=1e-12)
    assert res.converged
    got = {r["id"]: r["score"] for r in res.scores.collect()}
    assert got[0] == pytest.approx(1.5)          # 1 + 0.1*5
    assert got[1] == pytest.approx(1.0)


def test_community_conductance_bruteforce(spark):
    a, b = [0, 1, 2, 3], [4, 5, 6, 7]
    und = _clique(a) + _clique(b) + [(3, 4), (2, 5)]
    edges = spark.createDataFrame(und, "src long, dst long")
    labels = spark.createDataFrame(
        [(i, 10) for i in a] + [(i, 20) for i in b],
        "id long, community long")
    rows = {r["community"]: r for r in
            community_conductance(edges, labels).collect()}
    m2 = 2 * len(und)  # 28
    # each community: vol = 6*2 + 2 cross = 14, cut = 2
    for c in (10, 20):
        assert rows[c]["size"] == 4
        assert rows[c]["vol"] == 14
        assert rows[c]["cut"] == 2
        assert rows[c]["conductance"] == pytest.approx(
            round(2 / min(14, m2 - 14), 6))


def test_community_conductance_whole_graph_excluded(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    labels = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 1)], "id long, community long")
    rows = community_conductance(edges, labels).collect()
    assert len(rows) == 1 and rows[0]["conductance"] is None


def test_ranked_prefix_sums_matches_pandas(spark):
    rng = random.Random(11)
    data = [(i, rng.random(), rng.randrange(1, 9)) for i in range(500)]
    df = spark.createDataFrame(data, "id long, key double, w long")
    got = {
        r["id"]: (r["_rank"], r["cum_w"])
        for r in ranked_prefix_sums(
            df, [F.desc("key"), F.asc("id")], {"w": "cum_w"},
            num_partitions=7).collect()
    }
    want_order = sorted(data, key=lambda t: (-t[1], t[0]))
    run = 0
    for pos, (i, _, w) in enumerate(want_order, 1):
        run += w
        assert got[i][0] == pos
        assert got[i][1] == pytest.approx(run)


def test_ranked_prefix_sums_no_global_single_partition(spark):
    """The ranking must not collapse to a one-partition window: no
    plan node may contain a global (partition-less) Window sort."""
    df = spark.createDataFrame(
        [(i, float(i % 17), 1) for i in range(100)],
        "id long, key double, w long")
    out = ranked_prefix_sums(df, [F.asc("key"), F.asc("id")], {"w": "cw"},
                             num_partitions=5)
    assert math.isclose(
        out.agg(F.max("cw")).first()[0], 100.0, rel_tol=1e-9)
