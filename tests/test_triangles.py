"""Triangle fixtures — TriangleProcTest.java:61-149 ("tri-9"),
TriangleCountExpTest.java:59-93 ("tri-ring"),
ClusteringCoefficientTest.java:40-92 ("lcc-6"), per FIXTURES.md §7-9."""

import pytest

from tests.conftest import make_edges
from tests.oracles import triangles_oracle
from neo4j_graph_algorithms_spark.operators.triangles import (
    triangle_count,
    triangle_stream,
)

TRI9_NAMES = list("afceibhdg")
TRI9_EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "h"), ("d", "e"),
              ("e", "f"), ("f", "d"), ("b", "d"), ("g", "h"), ("h", "i"),
              ("i", "g")]


def test_tri9(spark):
    v = spark.createDataFrame([(i,) for i in range(9)], "id long")
    e = make_edges(spark, TRI9_EDGES, TRI9_NAMES)
    res = triangle_count(v, e)
    assert res.triangle_count == 3
    got = {r["id"]: r["triangles"] for r in res.node_counts.collect()}
    # three node-disjoint triangles → every node in exactly 1
    assert all(got[i] == 1 for i in range(9))


def test_tri_ring_with_hub(spark):
    n = 1000
    edges = [(i, (i + 1) % n, 1.0) for i in range(n)]
    edges += [(n, i, 1.0) for i in range(n)]  # center hub = node 1000
    v = spark.createDataFrame([(i,) for i in range(n + 1)], "id long")
    e = make_edges(spark, edges)
    res = triangle_count(v, e)
    assert res.triangle_count == 1000
    got = {r["id"]: r["triangles"] for r in res.node_counts.collect()}
    assert got[n] == 1000
    for i in range(0, n, 97):
        assert got[i] == 2
    assert res.average_coefficient == pytest.approx(0.666, abs=1e-3)


LCC_NAMES = list("abcdef")
LCC_EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "e"), ("e", "f"),
             ("c", "d"), ("c", "f"), ("d", "f")]
LCC_TRIANGLES = {"a": 1, "b": 1, "c": 3, "d": 1, "e": 1, "f": 2}
LCC_COEF = {"a": 1.0, "b": 1.0, "c": 0.3, "d": 1.0, "e": 1.0, "f": 2 / 3}


def test_lcc6(spark):
    v = spark.createDataFrame([(i,) for i in range(6)], "id long")
    e = make_edges(spark, LCC_EDGES, LCC_NAMES)
    res = triangle_count(v, e)
    idx = {n: i for i, n in enumerate(LCC_NAMES)}
    tri = {r["id"]: r["triangles"] for r in res.node_counts.collect()}
    coef = {r["id"]: r["coefficient"] for r in res.node_counts.collect()}
    for name in LCC_NAMES:
        assert tri[idx[name]] == LCC_TRIANGLES[name]
        assert coef[idx[name]] == pytest.approx(LCC_COEF[name], abs=1e-9)


def test_triangle_stream_rows(spark):
    e = make_edges(spark, TRI9_EDGES, TRI9_NAMES)
    rows = {(r["node_a"], r["node_b"], r["node_c"])
            for r in triangle_stream(e).collect()}
    assert len(rows) == 3
    for a, b, c in rows:
        assert a < b < c


def test_triangles_directed_input_and_self_loops(spark):
    # directed duplicates + self-loop: projection is undirected+dedup;
    # self-loops never count (ordering guard)
    pairs = [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 2, 1.0)]
    v = spark.createDataFrame([(i,) for i in range(3)], "id long")
    e = make_edges(spark, pairs)
    res = triangle_count(v, e)
    assert res.triangle_count == 1
    got = {r["id"]: r["triangles"] for r in res.node_counts.collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangles_vs_oracle_random_graph(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    n = 60
    und = {(int(min(a, b)), int(max(a, b)))
           for a, b in rng.randint(0, n, size=(400, 2)) if a != b}
    und = sorted(und)
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = make_edges(spark, [(a, b, 1.0) for a, b in und])
    res = triangle_count(v, e)
    t, coef, total = triangles_oracle(n, und)
    assert res.triangle_count == total
    got_t = {r["id"]: r["triangles"] for r in res.node_counts.collect()}
    got_c = {r["id"]: r["coefficient"] for r in res.node_counts.collect()}
    for i in range(n):
        assert got_t[i] == t[i]
        assert got_c[i] == pytest.approx(coef[i], abs=1e-12)
    assert res.average_coefficient == pytest.approx(float(coef.mean()), abs=1e-12)


# ---------------------------------------------------------------------------
# Incremental triangle maintenance
# ---------------------------------------------------------------------------

from neo4j_graph_algorithms_spark.operators.triangles import (
    triangle_count_incremental,
)


def test_triangles_incremental_vs_full(spark):
    import random

    random.seed(3)
    n = 80
    all_e = set()
    while len(all_e) < 400:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            all_e.add((a, b))
    all_e = sorted(all_e)
    old = [e for e in all_e if (e[0] + e[1]) % 5 != 0]
    # delta includes a duplicate and a reversed duplicate of old edges —
    # both must be ignored
    new = [e for e in all_e if (e[0] + e[1]) % 5 == 0]
    new += [old[0], (old[1][1], old[1][0])]
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    O = spark.createDataFrame(old, "src long, dst long")
    Nw = spark.createDataFrame(new, "src long, dst long")
    prev = triangle_count(v, O)
    inc = triangle_count_incremental(v, O, Nw, prev.node_counts)
    full = triangle_count(v, O.unionByName(Nw))
    gi = {r["id"]: (r["triangles"], round(r["coefficient"], 9))
          for r in inc.node_counts.collect()}
    gf = {r["id"]: (r["triangles"], round(r["coefficient"], 9))
          for r in full.node_counts.collect()}
    assert gi == gf
    assert inc.triangle_count == full.triangle_count
    assert inc.average_coefficient == pytest.approx(
        full.average_coefficient, abs=1e-12)


def test_triangles_incremental_all_new_triangle(spark):
    # a triangle formed entirely of delta edges (k=3 discoveries at
    # weight 1/3 each) and one mixed (k=1)
    v = spark.createDataFrame([(i,) for i in range(6)], "id long")
    O = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    Nw = spark.createDataFrame([(3, 4), (4, 5), (5, 3), (2, 0)],
                               "src long, dst long")
    prev = triangle_count(v, O)
    inc = triangle_count_incremental(v, O, Nw, prev.node_counts)
    got = {r["id"]: r["triangles"] for r in inc.node_counts.collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    assert inc.triangle_count == 2


def test_triangle_count_sampled_deterministic_and_exact_at_p1(spark):
    # p=1.0 keeps every edge -> identical to the exact operator
    from neo4j_graph_algorithms_spark.operators.triangles import (
        triangle_count, triangle_count_sampled,
    )
    import pytest as _pt

    n = 40
    edges = [(i, (i + 1) % n) for i in range(n)] + \
            [(i, (i + 2) % n) for i in range(n)]
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    exact = triangle_count(v, e)
    full = triangle_count_sampled(v, e, p=1.0)
    assert full.triangle_count == exact.triangle_count
    got = {r["id"]: r["triangles_est"] for r in full.node_counts.collect()}
    want = {r["id"]: r["triangles"] for r in exact.node_counts.collect()}
    assert got == {k: float(v_) for k, v_ in want.items()}

    # p=0.5: deterministic across runs (hash coin, not RNG)
    s1 = triangle_count_sampled(v, e, p=0.5, seed=0)
    s2 = triangle_count_sampled(v, e, p=0.5, seed=0)
    assert s1.triangle_count == s2.triangle_count
    r1 = sorted((r["id"], r["triangles_est"])
                for r in s1.node_counts.collect())
    r2 = sorted((r["id"], r["triangles_est"])
                for r in s2.node_counts.collect())
    assert r1 == r2
    # estimates are 8x integers (1/p^3 scaling)
    assert all(val % 8.0 == 0.0 for _, val in r1)
    with _pt.raises(ValueError):
        triangle_count_sampled(v, e, p=0.0)


def test_triangle_count_sampled_estimator_reasonable(spark):
    # dense-ish random graph: the p=0.7 estimate lands within 60% of
    # truth (deterministic sample -> deterministic assertion, chosen
    # with margin; estimator std is ~15% here)
    from neo4j_graph_algorithms_spark.operators.triangles import (
        triangle_count, triangle_count_sampled,
    )
    import random
    rng = random.Random(11)
    n = 60
    edges = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.25]
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    t_true = triangle_count(v, e).triangle_count
    t_est = triangle_count_sampled(v, e, p=0.7, seed=0).triangle_count
    assert t_true > 50
    assert 0.4 * t_true <= t_est <= 1.6 * t_true
