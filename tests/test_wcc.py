"""WCC fixtures — UnionFindsTest.java:52-154 ("cc-lines") and
UnionFindProcIntegrationTest threshold semantics ("cc-threshold"),
per FIXTURES.md §3-4."""

import pytest

from tests.conftest import make_edges
from neo4j_graph_algorithms_spark.operators.wcc import connected_components


def _components_by_member(rows):
    comp = {}
    for r in rows:
        comp.setdefault(r["component"], set()).add(r["id"])
    return sorted((frozenset(v) for v in comp.values()), key=min)


@pytest.mark.parametrize("local_dss", [True, False])
def test_cc_lines_16_components(spark, local_dss):
    # 16 disjoint 10-node line graphs (UnionFindsTest.createLine)
    edges = []
    for line in range(16):
        base = line * 10
        for i in range(9):
            edges.append((base + i, base + i + 1, 1.0))
    v = spark.createDataFrame([(i,) for i in range(160)], "id long")
    e = make_edges(spark, edges)
    res = connected_components(v, e, local_dss=local_dss)
    assert res.converged
    comps = _components_by_member(res.components.collect())
    assert len(comps) == 16
    for line in range(16):
        expected = frozenset(range(line * 10, line * 10 + 10))
        assert expected in comps
    # canonical id = min member
    got = {r["id"]: r["component"] for r in res.components.collect()}
    for line in range(16):
        for i in range(10):
            assert got[line * 10 + i] == line * 10


NAMES = list("ABCDEFGHIJ")
# cost present only on D→E (4.2); defaultValue 10.0 fills the rest
TH_EDGES = [("A", "B", 10.0), ("B", "C", 10.0), ("C", "D", 10.0),
            ("D", "E", 4.2), ("E", "F", 10.0), ("F", "G", 10.0),
            ("H", "I", 10.0)]


def _run_threshold(spark, threshold):
    v = spark.createDataFrame([(i,) for i in range(10)], "id long")
    e = make_edges(spark, TH_EDGES, NAMES)
    res = connected_components(v, e, threshold=threshold)
    sizes = sorted(
        len(m) for m in _components_by_member(res.components.collect())
    )
    return sizes


def test_cc_threshold_none(spark):
    assert _run_threshold(spark, None) == [1, 2, 7]


def test_cc_threshold_5(spark):
    # only D→E (4.2) fails the >= 5.0 gate (GraphUnionFind.java:82-99)
    assert _run_threshold(spark, 5.0) == [1, 2, 3, 4]


def test_cc_threshold_low(spark):
    assert _run_threshold(spark, 3.14) == [1, 2, 7]


def test_cc_self_loop_and_isolated(spark):
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = make_edges(spark, [(0, 0, 1.0), (1, 2, 1.0)])
    res = connected_components(v, e)
    got = {r["id"]: r["component"] for r in res.components.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 3}


def test_cc_long_path_fast_convergence(spark):
    # pointer jumping: a 200-node path must converge far faster than
    # its diameter (hash-to-min alone would need ~200 rounds)
    n = 200
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = make_edges(spark, [(i, i + 1, 1.0) for i in range(n - 1)])
    res = connected_components(v, e, local_dss=False, max_iterations=30)
    assert res.converged
    assert res.iterations <= 12
    got = {r["id"]: r["component"] for r in res.components.collect()}
    assert set(got.values()) == {0}


# ---------------------------------------------------------------------------
# Incremental WCC (component contraction over an edge delta)
# ---------------------------------------------------------------------------

from neo4j_graph_algorithms_spark.operators.wcc import (
    connected_components_incremental,
)


def test_wcc_incremental_merges_lines(spark):
    # 16 disjoint 10-node lines; delta edges chain lines 0-1, 2-3, and
    # self-contained extras; result must equal full recompute
    edges = []
    for line in range(16):
        base = line * 10
        for i in range(9):
            edges.append((base + i, base + i + 1, 1.0))
    v = spark.createDataFrame([(i,) for i in range(160)], "id long")
    e = make_edges(spark, edges)
    prev = connected_components(v, e).components
    delta = spark.createDataFrame(
        [(9, 10), (25, 37), (37, 49), (155, 155), (3, 7)],
        "src long, dst long")
    inc = connected_components_incremental(prev, delta)
    assert inc.converged
    full = connected_components(
        v, e.select("src", "dst").unionByName(delta))
    gi = {r["id"]: r["component"] for r in inc.components.collect()}
    gf = {r["id"]: r["component"] for r in full.components.collect()}
    assert gi == gf
    # transitive merge worked: lines 2,3,4 fused under min id 20
    assert gi[49] == 20 and gi[25] == 20


def test_wcc_incremental_new_nodes(spark):
    v = spark.createDataFrame([(i,) for i in range(6)], "id long")
    e = make_edges(spark, [(0, 1, 1.0), (2, 3, 1.0)])
    prev = connected_components(v, e).components
    # delta introduces unseen nodes 10, 11: 10 bridges into comp 2,
    # 11 stays a fresh singleton pair with 12
    delta = spark.createDataFrame(
        [(10, 3), (11, 12)], "src long, dst long")
    inc = connected_components_incremental(prev, delta).components
    got = {r["id"]: r["component"] for r in inc.collect()}
    assert got[10] == 2 and got[3] == 2
    assert got[11] == 11 and got[12] == 11
    # untouched singletons keep their own labels
    assert got[4] == 4 and got[5] == 5


def test_wcc_incremental_empty_delta(spark):
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = make_edges(spark, [(0, 1, 1.0)])
    prev = connected_components(v, e).components
    delta = spark.createDataFrame([], "src long, dst long")
    inc = connected_components_incremental(prev, delta).components
    gi = {r["id"]: r["component"] for r in inc.collect()}
    gp = {r["id"]: r["component"] for r in prev.collect()}
    assert gi == gp


def test_community_stats_known_distribution(spark):
    from neo4j_graph_algorithms_spark.operators.wcc import community_stats

    # sizes: 1, 2, 3, 4 over 10 nodes / 4 communities
    rows = []
    nid = 0
    for c, sz in enumerate([1, 2, 3, 4]):
        for _ in range(sz):
            rows.append((nid, c))
            nid += 1
    comps = spark.createDataFrame(rows, "id long, component long")
    r = community_stats(comps).first()
    assert (r["n_nodes"], r["n_communities"]) == (10, 4)
    assert (r["min_size"], r["max_size"]) == (1, 4)
    # exact interpolated percentiles over [1,2,3,4]
    assert r["p50"] == 2.5
    assert r["p25"] == 1.75
    assert r["p75"] == 3.25
