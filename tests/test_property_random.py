"""Property-based randomized oracles (hypothesis): the DataFrame
operators vs straightforward in-memory reference implementations on
arbitrary small graphs. Bounded example counts — every example spins
Spark jobs."""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import make_edges
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
from neo4j_graph_algorithms_spark.operators.wcc import connected_components
from neo4j_graph_algorithms_spark.operators.traversal import sssp
from neo4j_graph_algorithms_spark.registry import list_algorithms, resolve


N = 8  # vertices per random graph

edge_sets = st.sets(
    st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
    min_size=1, max_size=16,
)

_SETTINGS = settings(
    max_examples=5, deadline=None, derandomize=True, database=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _v(spark):
    return spark.createDataFrame([(i,) for i in range(N)], "id long")


@given(edges=edge_sets)
@_SETTINGS
def test_pagerank_matches_numpy_power_iteration(spark, edges):
    rows = [(s, d, 1.0) for s, d in edges]
    res = pagerank(_v(spark), make_edges(spark, rows),
                   max_iterations=8, tol=0.0)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    # reference semantics: r0 = 0.15; r = 0.15 + 0.85 * sum(r[u]/outdeg(u))
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {i: 0.15 for i in range(N)}
    for _ in range(8):
        msg = {i: 0.0 for i in range(N)}
        for s, d in edges:
            msg[d] += rank[s] / outdeg[s]
        rank = {i: 0.15 + 0.85 * msg[i] for i in range(N)}
    for i in range(N):
        assert got[i] == pytest.approx(rank[i], abs=1e-9)


@given(edges=edge_sets)
@_SETTINGS
def test_wcc_matches_union_find(spark, edges):
    rows = [(s, d, 1.0) for s, d in edges]
    res = connected_components(_v(spark), make_edges(spark, rows))
    got = {r["id"]: r["component"] for r in res.components.collect()}
    parent = list(range(N))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        parent[find(s)] = find(d)
    comp = {}
    for i in range(N):
        comp.setdefault(find(i), []).append(i)
    expect = {i: min(comp[find(i)]) for i in range(N)}
    assert got == expect


@given(edges=st.sets(
    st.tuples(st.integers(0, N - 1), st.integers(0, N - 1),
              st.integers(1, 5)),
    min_size=1, max_size=16,
))
@_SETTINGS
def test_sssp_matches_bellman_ford(spark, edges):
    rows = [(s, d, float(w)) for s, d, w in edges]
    got = {r["id"]: r["cost"]
           for r in sssp(_v(spark), make_edges(spark, rows), 0).collect()}
    dist = {0: 0.0}
    for _ in range(N):
        for s, d, w in edges:
            if s in dist and dist[s] + w < dist.get(d, math.inf):
                dist[d] = dist[s] + w
    assert got == {k: pytest.approx(v) for k, v in dist.items()}


def test_registry_resolves_every_procedure():
    names = list_algorithms()
    assert len(names) >= 40
    for name in names:
        target = resolve(name)
        assert callable(target) or isinstance(target, type), name


@given(edges=edge_sets)
@_SETTINGS
def test_k_truss_matches_python_peel(spark, edges):
    from neo4j_graph_algorithms_spark.operators.ktruss import k_truss

    rows = [(s, d, 1.0) for s, d in edges]
    res = k_truss(make_edges(spark, rows), 4)
    got = {(r["a"], r["b"]) for r in res.edges.collect()}

    # python reference: canonical edges, peel support < 2 to fixpoint
    cur = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    while True:
        sup = {e: 0 for e in cur}
        es = sorted(cur)
        for i, (a, b) in enumerate(es):
            for (c, d) in es[i + 1:]:
                if c != a:
                    continue  # wedge needs shared first endpoint a
                # candidate triangle (a, b, d) with b < d
                lo, hi = min(b, d), max(b, d)
                if (lo, hi) in cur:
                    for e in ((a, b), (a, d), (lo, hi)):
                        sup[e] += 1
        nxt = {e for e in cur if sup[e] >= 2}
        if nxt == cur:
            break
        cur = nxt
    assert got == cur
    assert res.converged


@given(
    edges=st.sets(
        st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
        min_size=1, max_size=16),
    scores=st.dictionaries(
        st.integers(0, N - 1),
        st.floats(0.01, 1.0, allow_nan=False),
        min_size=1, max_size=N),
)
@_SETTINGS
def test_sweep_cut_matches_python_sweep(spark, edges, scores):
    from neo4j_graph_algorithms_spark.operators.local_cluster import (
        sweep_cut,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not und:
        return
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    sup = {i: s for i, s in scores.items() if i in deg}
    if not sup:
        return
    e = make_edges(spark, sorted(und))
    sdf = spark.createDataFrame(
        sorted(sup.items()), "id long, score double")
    got = sorted(sweep_cut(e, sdf, num_partitions=3).collect(),
                 key=lambda r: r["pos"])

    m2 = 2 * len(und)
    order = sorted(sup, key=lambda i: (-sup[i] / deg[i], i))
    inset = set()
    want = []
    for pos, v in enumerate(order, 1):
        inset.add(v)
        vol = sum(deg[x] for x in inset)
        cut = sum(1 for a, b in und if (a in inset) != (b in inset))
        if min(vol, m2 - vol) > 0:
            want.append((pos, v, vol, cut))
    assert [(r["pos"], r["id"], r["vol"], r["cut"]) for r in got] == want
