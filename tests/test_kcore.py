"""k-core / coreness vs a pure-python peeling oracle."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_edges
from neo4j_graph_algorithms_spark.operators.kcore import coreness, k_core


def _py_coreness(n, pairs):
    """Reference peeling in plain python (undirected, dedup, no loops)."""
    adj = {i: set() for i in range(n)}
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    core = {i: 0 for i in range(n)}
    alive = set(range(n))
    k = 1
    while alive:
        changed = True
        while changed:
            drop = {v for v in alive if len(adj[v] & alive) < k}
            changed = bool(drop)
            alive -= drop
        for v in alive:
            core[v] = k
        k += 1
    return core


# triangle+pendant fused with a 4-clique sharing vertex 2
PAIRS = [(0, 1), (1, 2), (2, 0), (2, 3),
         (2, 4), (2, 5), (2, 6), (4, 5), (4, 6), (5, 6),
         (7, 8)]
N = 10  # vertex 9 is isolated


def _fixture(spark):
    e = make_edges(spark, PAIRS)
    v = spark.range(N).select(F.col("id"))
    return v, e


def test_coreness_matches_python_oracle(spark):
    v, e = _fixture(spark)
    got = {r.id: r.coreness for r in coreness(v, e).collect()}
    want = _py_coreness(N, PAIRS)
    assert got == want


def test_k_core_membership(spark):
    v, e = _fixture(spark)
    want = _py_coreness(N, PAIRS)
    for k in (1, 2, 3, 4):
        res = k_core(v, e, k)
        assert res.converged
        got = {r.id for r in res.members.collect()}
        assert got == {i for i, c in want.items() if c >= k}, k


def test_k_core_cascade_needs_multiple_rounds(spark):
    # path 0-1-2-3-4: 2-core is empty but only after a cascading peel
    e = make_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    v = spark.range(5).select(F.col("id"))
    res = k_core(v, e, 2)
    assert res.members.count() == 0
    assert res.rounds >= 2  # endpoints first, then the cascade inward


def test_max_rounds_is_deterministic_superset(spark):
    e = make_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    v = spark.range(5).select(F.col("id"))
    one = k_core(v, e, 2, max_rounds=1)
    assert not one.converged
    got = {r.id for r in one.members.collect()}
    assert got == {1, 2, 3}  # round 1 removes only the degree-1 endpoints


def test_duplicate_and_reversed_edges_ignored(spark):
    e = make_edges(spark, [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (0, 0)])
    v = spark.range(3).select(F.col("id"))
    got = {r.id: r.coreness for r in coreness(v, e).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_bad_k_raises(spark):
    v, e = _fixture(spark)
    with pytest.raises(ValueError):
        k_core(v, e, 0)


def test_k_truss_k4_keeps_only_clique(spark):
    """K4 edges each close 2 triangles; a pendant triangle's edges close
    1 — the 4-truss is exactly the K4, the 3-truss keeps both."""
    from neo4j_graph_algorithms_spark.operators.ktruss import k_truss

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pendant = [(3, 10), (3, 11), (10, 11)]
    chain = [(11, 12), (12, 13)]  # triangle-free tail
    e = spark.createDataFrame(k4 + pendant + chain, "src long, dst long")

    t4 = k_truss(e, 4)
    assert t4.converged
    assert {(r["a"], r["b"]) for r in t4.edges.collect()} == set(k4)

    t3 = k_truss(e, 3)
    assert ({(r["a"], r["b"]) for r in t3.edges.collect()}
            == set(k4) | set(pendant))

    # fixed rounds: one round only removes the chain + pendant edges
    # whose support was already short; peel state is a superset
    t4r1 = k_truss(e, 4, max_rounds=1)
    got = {(r["a"], r["b"]) for r in t4r1.edges.collect()}
    assert set(k4) <= got
    assert not t4r1.converged or got == set(k4)

    with pytest.raises(ValueError):
        k_truss(e, 2)


def test_densest_subgraph_finds_planted_clique(spark):
    """A K6 planted in a sparse chain: the peel must report the clique
    (density 15/6 = 2.5) — the chain dilutes round-0 density, later
    rounds strip it away."""
    from neo4j_graph_algorithms_spark.operators.densest import (
        densest_subgraph,
    )

    k6 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    chain = [(i, i + 1) for i in range(6, 30)]
    e = spark.createDataFrame(k6 + chain + [(5, 6)], "src long, dst long")
    v = spark.createDataFrame([(i,) for i in range(31)], "id long")
    res = densest_subgraph(v, e, epsilon=0.5)
    got = {r["id"] for r in res.members.collect()}
    assert got == set(range(6))
    assert res.density == pytest.approx(2.5)
    assert all(r["density"] == 2.5 for r in res.members.collect())
    # bounded rounds: best tracked over the bound only, still a valid
    # intermediate subgraph
    res1 = densest_subgraph(v, e, epsilon=0.5, max_rounds=1)
    assert res1.rounds == 1
    with pytest.raises(ValueError):
        densest_subgraph(v, e, epsilon=0.0)
