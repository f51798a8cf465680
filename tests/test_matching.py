"""Maximal matching (operators/matching.py) vs a python replay."""

import hashlib

from pyspark.sql import functions as F

import numpy as np

from neo4j_graph_algorithms_spark.operators.matching import (
    maximal_matching,
)


def _pri(rnd, seed, lo, hi):
    h = hashlib.md5(f"{seed}|{rnd}|{lo}|{hi}".encode()).hexdigest()
    return f"{h}-{str(lo).zfill(12)}-{str(hi).zfill(12)}"


def _replay(edges, seed=42, max_rounds=64):
    live = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    matched = []
    rnd = 0
    while live and rnd < max_rounds:
        rnd += 1
        pri = {e: _pri(rnd, seed, *e) for e in live}
        vmin = {}
        for (lo, hi), p in pri.items():
            for v in (lo, hi):
                if v not in vmin or p < vmin[v]:
                    vmin[v] = p
        sel = [e for e in live
               if pri[e] == vmin[e[0]] and pri[e] == vmin[e[1]]]
        matched += [(lo, hi, rnd) for lo, hi in sel]
        mv = {v for e in sel for v in e}
        live = {e for e in live if e[0] not in mv and e[1] not in mv}
    return sorted(matched)


def _spark(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    res = maximal_matching(e, **kw)
    return res, sorted((r.u, r.v, r.round)
                       for r in res.matching.collect())


def test_matches_replay_random(spark):
    rng = np.random.default_rng(9)
    edges = sorted({(int(rng.integers(30)), int(rng.integers(30)))
                    for _ in range(80)})
    res, got = _spark(spark, edges)
    assert got == _replay(edges)
    assert res.converged


def test_valid_and_maximal(spark):
    rng = np.random.default_rng(17)
    edges = [(int(rng.integers(25)), int(rng.integers(25)))
             for _ in range(70)]
    edges = [(s, d) for s, d in edges if s != d]
    res, got = _spark(spark, edges)
    used = [v for u, v, _ in got for v in ()]  # noqa
    verts = [x for u, v, _ in got for x in (u, v)]
    assert len(verts) == len(set(verts))       # vertex-disjoint
    assert res.converged
    mset = set(verts)
    for s, d in edges:                          # maximality
        assert s in mset or d in mset


def test_fixed_rounds_prefix(spark):
    edges = [(i, i + 1) for i in range(12)]    # a path
    _, full = _spark(spark, edges)
    _, two = _spark(spark, edges, max_rounds=2)
    assert two == [m for m in full if m[2] <= 2]


def test_self_loops_and_parallel(spark):
    edges = [(0, 0), (1, 2), (2, 1), (1, 2)]
    res, got = _spark(spark, edges)
    assert got == [(1, 2, 1)]
    assert res.converged


def test_coarsen_contracts_matched_pairs(spark):
    from neo4j_graph_algorithms_spark.operators.matching import (
        coarsen_graph,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], "src long, dst long")
    matching = spark.createDataFrame(
        [(0, 1, 1), (2, 3, 1)], "u long, v long, round int")
    got = {(r.src, r.dst): r.weight
           for r in coarsen_graph(edges, matching).collect()}
    # supervertices: {0,1}->0, {2,3}->2; edges 1-2,0-2 -> (0,2) x2;
    # 2-3 and 0-1 become loops and vanish; 3-0 -> (2,0)
    assert got == {(0, 2): 2, (2, 0): 1}


def test_coarsen_unmatched_pass_through(spark):
    from neo4j_graph_algorithms_spark.operators.matching import (
        coarsen_graph,
    )

    edges = spark.createDataFrame([(5, 6), (6, 7)], "src long, dst long")
    matching = spark.createDataFrame([(5, 6, 1)],
                                     "u long, v long, round int")
    got = {(r.src, r.dst): r.weight
           for r in coarsen_graph(edges, matching).collect()}
    assert got == {(5, 7): 1}


def test_match_coarsen_shrinks(spark):
    import numpy as np
    from neo4j_graph_algorithms_spark.operators.matching import (
        coarsen_graph,
        maximal_matching,
    )

    rng = np.random.default_rng(3)
    edges = [(int(rng.integers(40)), int(rng.integers(40)))
             for _ in range(150)]
    edges = [(s, d) for s, d in edges if s != d]
    e = spark.createDataFrame(edges, "src long, dst long")
    res = maximal_matching(e)
    coarse = coarsen_graph(e, res.matching)
    n0 = len({v for t in edges for v in t})
    n1 = coarse.select(F.col("src").alias("id")).union(
        coarse.select(F.col("dst").alias("id"))).distinct().count()
    assert n1 < n0


def test_vertex_cover_covers_every_edge(spark):
    import numpy as np
    from neo4j_graph_algorithms_spark.operators.matching import (
        vertex_cover_2approx,
    )

    rng = np.random.default_rng(21)
    edges = [(int(rng.integers(30)), int(rng.integers(30)))
             for _ in range(90)]
    edges = [(s, d) for s, d in edges if s != d]
    e = spark.createDataFrame(edges, "src long, dst long")
    cover = {r.id for r in vertex_cover_2approx(e).collect()}
    for s, d in edges:
        assert s in cover or d in cover
    # factor-2 witness: |cover| = 2 * |matching| and a matching needs
    # one endpoint per edge, so |cover| <= 2 * OPT
    assert len(cover) % 2 == 0
