"""Luby MIS / greedy coloring / redirect resolution vs python oracles."""

import random

from pyspark.sql import functions as F

from tests.conftest import make_edges
from neo4j_graph_algorithms_spark.operators.mis import (
    greedy_coloring,
    maximal_independent_set,
)
from neo4j_graph_algorithms_spark.operators.redirects import resolve_redirects


def _vertices(spark, n):
    return spark.range(n).select(F.col("id"))


def _check_mis(n, pairs, members, *, maximal=True):
    adj = {i: set() for i in range(n)}
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    m = set(members)
    for v in m:
        assert not (adj[v] & m), f"edge inside MIS at {v}"
    if maximal:
        for v in set(range(n)) - m:
            assert adj[v] & m, f"{v} could join the set — not maximal"


def test_mis_ring(spark):
    n = 12
    pairs = [(i, (i + 1) % n) for i in range(n)]
    e = make_edges(spark, pairs)
    res = maximal_independent_set(_vertices(spark, n), e)
    assert res.converged
    _check_mis(n, pairs, [r.id for r in res.members.collect()])


def test_mis_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
        e = make_edges(spark, pairs)
        res = maximal_independent_set(_vertices(spark, n), e, seed=trial)
        assert res.converged
        _check_mis(n, pairs, [r.id for r in res.members.collect()])


def test_mis_isolated_vertices_win_round_one(spark):
    e = make_edges(spark, [(0, 1)])
    res = maximal_independent_set(_vertices(spark, 5), e, max_rounds=1)
    got = {r.id for r in res.members.collect()}
    assert {2, 3, 4} <= got
    assert len(got & {0, 1}) == 1  # exactly one endpoint of the edge


def test_mis_deterministic_and_fixed_round_prefix(spark):
    rng = random.Random(3)
    n = 30
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    e = make_edges(spark, pairs)
    full = maximal_independent_set(_vertices(spark, n), e, seed=9)
    again = maximal_independent_set(_vertices(spark, n), e, seed=9)
    assert {r.id for r in full.members.collect()} == \
        {r.id for r in again.members.collect()}
    # a fixed-round run is a prefix (subset) of the converged run and
    # still independent
    part = maximal_independent_set(_vertices(spark, n), e, seed=9,
                                   max_rounds=1)
    sub = {r.id for r in part.members.collect()}
    assert sub <= {r.id for r in full.members.collect()}
    _check_mis(n, pairs, sub, maximal=False)


def test_coloring_proper_on_random_graph(spark):
    rng = random.Random(11)
    n = 35
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(100)]
    e = make_edges(spark, pairs)
    cols = {r.id: r.color for r in
            greedy_coloring(_vertices(spark, n), e).collect()}
    assert len(cols) == n
    assert all(c >= 0 for c in cols.values())
    adj = [(s, d) for s, d in pairs if s != d]
    for s, d in adj:
        assert cols[s] != cols[d], f"edge ({s},{d}) monochromatic"


def test_coloring_clique_needs_n_colors(spark):
    n = 5
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    e = make_edges(spark, pairs)
    cols = {r.id: r.color for r in
            greedy_coloring(_vertices(spark, n), e).collect()}
    assert sorted(cols.values()) == [0, 1, 2, 3, 4]


def test_coloring_max_colors_caps_with_undecided(spark):
    n = 5
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    e = make_edges(spark, pairs)
    cols = {r.id: r.color for r in
            greedy_coloring(_vertices(spark, n), e, max_colors=2).collect()}
    assert sorted(c for c in cols.values() if c >= 0) == [0, 1]
    assert sum(1 for c in cols.values() if c == -1) == 3


def _redirects(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_redirects_chain_and_terminal(spark):
    # 1 -> 2 -> 3 -> 10 (10 not a source)
    r = resolve_redirects(
        _redirects(spark, [(1, 2), (2, 3), (3, 10)]), doubling_rounds=4)
    got = {x.src: (x.final_dst, x.hops, x.resolved) for x in r.collect()}
    assert got == {1: (10, 3, 1), 2: (10, 2, 1), 3: (10, 1, 1)}


def test_redirects_cycle_flagged_unresolved(spark):
    r = resolve_redirects(
        _redirects(spark, [(1, 2), (2, 3), (3, 1), (7, 1)]),
        doubling_rounds=3)
    got = {x.src: (x.hops, x.resolved) for x in r.collect()}
    for s in (1, 2, 3, 7):
        assert got[s] == (8, 0)  # 2^3 hops, still inside the domain


def test_redirects_chain_longer_than_cap(spark):
    # 0 -> 1 -> ... -> 20; cap 2^2 = 4 hops leaves the head unresolved
    rows = [(i, i + 1) for i in range(20)]
    r = resolve_redirects(_redirects(spark, rows), doubling_rounds=2)
    got = {x.src: (x.final_dst, x.hops, x.resolved) for x in r.collect()}
    assert got[0] == (4, 4, 0)
    assert got[16] == (20, 4, 1)
    assert got[19] == (20, 1, 1)


def test_redirects_duplicate_src_and_self_loop(spark):
    # duplicate src canonicalizes to min dst; self-loop dropped
    r = resolve_redirects(
        _redirects(spark, [(1, 5), (1, 3), (2, 2), (3, 9)]),
        doubling_rounds=3)
    got = {x.src: (x.final_dst, x.hops, x.resolved) for x in r.collect()}
    assert got[1] == (9, 2, 1)
    assert got[3] == (9, 1, 1)
    assert 2 not in got


def test_redirects_random_functional_graphs_vs_python(spark):
    rng = random.Random(13)
    for trial in range(3):
        n = 60
        # random functional mapping over a subset of [0, n): ~2/3 of
        # nodes redirect somewhere (self-loops and dup srcs included to
        # exercise canonicalization)
        rows = [(s, rng.randrange(n)) for s in range(n)
                if rng.random() < 0.66]
        rows += [(rows[0][0], rng.randrange(n))] if rows else []
        k = 4
        got = {x.src: (x.final_dst, x.hops, x.resolved)
               for x in resolve_redirects(
                   _redirects(spark, rows), doubling_rounds=k).collect()}
        # python replay: min-dst per src, drop self-loops, walk 2^k steps
        f = {}
        for s, d in rows:
            if s != d:
                f[s] = min(f.get(s, d), d)
        cap = 2 ** k
        for s in f:
            cur, hops = s, 0
            while hops < cap and cur in f:
                cur = f[cur]
                hops += 1
            exp = (cur, hops, 0 if cur in f else 1)
            assert got[s] == exp, (trial, s, got[s], exp)
        assert set(got) == set(f)
