"""HyperBall (HLL neighborhood function) invariants on small graphs.

Reference anchor: the closeness family the sketch approximates is
impl/closeness/MSClosenessCentrality.java (exact MS-BFS); HyperBall is
the published 10^12-edge scale substitute (Boldi & Vigna 2013). These
tests pin the sketch's structural guarantees — monotone balls, exact
small-range linear counting, direction semantics — and that the derived
closeness agrees with the exact operator on a graph small enough that
linear counting is exact.
"""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_edges
from neo4j_graph_algorithms_spark.operators.hyperball import (
    approx_effective_diameter,
    approx_neighborhood_function,
    closeness_hyperball,
    hll_alpha,
    hyperball,
)


def _vertices(spark, n):
    return spark.range(n).select(F.col("id"))


def _path_edges(spark, n):
    # 0 -> 1 -> 2 -> ... -> n-1
    return make_edges(spark, [(i, i + 1) for i in range(n - 1)])


def test_balls_monotone_and_start_at_one(spark):
    e = _path_edges(spark, 8)
    res = hyperball(_vertices(spark, 8), e, radius=4, b=4)
    rows = res.balls.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, {})[r.r] = r.ball_est
    for vid, series in by_id.items():
        assert series[0] == pytest.approx(1.0, rel=0.35)
        for r in range(1, 5):
            assert series[r] >= series[r - 1] - 1e-9


def test_path_graph_exact_small_range(spark):
    # 16 registers, balls of size <= 5: linear counting is near-exact and
    # collision-free whp on this fixture; exact sizes on a path are r+1
    # capped by distance to the end of the path.
    n = 6
    res = hyperball(_vertices(spark, n), _path_edges(spark, n), radius=5, b=6)
    got = {(r.id, r.r): r.ball_est for r in res.balls.collect()}
    for v in range(n):
        for r in range(6):
            exact = min(r, n - 1 - v) + 1
            assert got[(v, r)] == pytest.approx(exact, rel=0.25), (v, r)


def test_direction_semantics(spark):
    # star 0 -> {1,2,3}: out-ball(0,1)=4, in-ball(0,1)=1; leaves reversed
    e = make_edges(spark, [(0, 1), (0, 2), (0, 3)])
    v = _vertices(spark, 4)
    out = {r.id: r.ball_est
           for r in hyperball(v, e, radius=1, b=6).balls
           .filter("r = 1").collect()}
    inn = {r.id: r.ball_est
           for r in hyperball(v, e, radius=1, b=6, direction="in").balls
           .filter("r = 1").collect()}
    assert out[0] == pytest.approx(4.0, rel=0.2)
    assert inn[0] == pytest.approx(1.0, rel=0.2)
    assert inn[1] == pytest.approx(2.0, rel=0.2)
    both = {r.id: r.ball_est
            for r in hyperball(v, e, radius=1, b=6, direction="both").balls
            .filter("r = 1").collect()}
    assert both[1] == pytest.approx(2.0, rel=0.2)


def test_anf_and_effective_diameter_path(spark):
    n = 6
    res = hyperball(_vertices(spark, n), _path_edges(spark, n), radius=6, b=6)
    anf = {r.r: r.anf
           for r in approx_neighborhood_function(res.balls).collect()}
    # exact anf(r) = sum_v min(r, n-1-v)+1
    for r in range(7):
        exact = sum(min(r, n - 1 - v) + 1 for v in range(n))
        assert anf[r] == pytest.approx(exact, rel=0.2), r
    ed = approx_effective_diameter(res.balls, alpha=0.9).collect()[0]
    assert 2.0 <= ed.effective_diameter <= 5.0


def test_closeness_matches_exact_on_small_graph(spark):
    # undirected triangle + pendant: 0-1, 1-2, 2-0, 2-3 — compare the
    # sketch-derived closeness to the exact MS-BFS operator
    from neo4j_graph_algorithms_spark.operators.closeness import (
        closeness_centrality,
    )

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    e = make_edges(spark, pairs)
    v = _vertices(spark, 4)
    res = hyperball(v, e, radius=3, b=8, direction="both")
    approx = {r.id: r.closeness
              for r in closeness_hyperball(res.balls).collect()}
    exact = {r.id: r.centrality
             for r in closeness_centrality(v, e, direction="both").collect()}
    for vid in range(4):
        assert approx[vid] == pytest.approx(exact[vid], rel=0.15), vid


def test_alpha_constants():
    assert hll_alpha(16) == 0.673
    assert hll_alpha(64) == 0.709
    assert hll_alpha(256) == pytest.approx(0.7213 / (1 + 1.079 / 256))


def test_bad_params_raise(spark):
    e = _path_edges(spark, 3)
    v = _vertices(spark, 3)
    with pytest.raises(ValueError):
        hyperball(v, e, radius=1, b=1)
    with pytest.raises(ValueError):
        hyperball(v, e, radius=1, b=4, direction="sideways")


def test_approx_eccentricity_path_exact(spark):
    """On a short directed path the sketch is collision-free whp and the
    plateau radius equals the exact eccentricity min(n-1-v, R)."""
    from neo4j_graph_algorithms_spark.operators.hyperball import (
        approx_eccentricity,
    )

    n, R = 6, 6
    e = _path_edges(spark, n)
    # b=5 (m=32): collision-free on this fixture (b=4 under-reports
    # ecc(0) by 1 — node 5's register is dominated, the documented
    # HLL trade); deterministic for the fixed Murmur3 salts
    res = hyperball(_vertices(spark, n), e, radius=R, b=5)
    got = {r["id"]: r["ecc"] for r in
           approx_eccentricity(res.balls).collect()}
    for v in range(n):
        assert got[v] == min(n - 1 - v, R), v


def test_approx_eccentricity_truncates_at_radius(spark):
    from neo4j_graph_algorithms_spark.operators.hyperball import (
        approx_eccentricity,
    )

    n, R = 8, 2
    e = _path_edges(spark, n)
    res = hyperball(_vertices(spark, n), e, radius=R, b=4)
    got = {r["id"]: r["ecc"] for r in
           approx_eccentricity(res.balls).collect()}
    assert max(got.values()) <= R
    assert got[n - 1] == 0  # sink: ball never grows
