"""Closeness-family + betweenness tests against reference fixtures.

Fixtures: ClosenessCentralityTest.java:46-102 (5-node bidirectional
line, goldens 0.4/0.57/0.66/0.57/0.4 at 1e-2),
BetweennessCentralityTest2.java:48-95 (7-node double-diamond,
c=8, d=9, e=8, rest 0), HarmonicCentrality semantics
(HarmonicCentrality.java:63-83), Dangalchev
(DangalchevClosenessCentrality.java:59-77).
"""

import pytest

from tests.conftest import make_edges
from neo4j_graph_algorithms_spark.operators.closeness import (
    closeness_centrality,
    dangalchev_centrality,
    harmonic_centrality,
    ms_bfs_distances,
)
from neo4j_graph_algorithms_spark.operators.betweenness import (
    betweenness_centrality,
)


def _v(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "id long")


LINE5 = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]


def test_ms_bfs_line(spark):
    pairs = ms_bfs_distances(_v(spark, 5), make_edges(spark, LINE5))
    got = {(r["source"], r["id"]): r["distance"] for r in pairs.collect()}
    assert got[(0, 4)] == 4 and got[(4, 0)] == 4
    assert got[(2, 0)] == 2 and got[(1, 2)] == 1
    assert (0, 0) not in got  # source never revisited / emitted
    assert len(got) == 20  # all ordered pairs


def test_closeness_line5(spark):
    res = closeness_centrality(_v(spark, 5), make_edges(spark, LINE5))
    got = {r["id"]: r["centrality"] for r in res.collect()}
    expected = [0.4, 0.57, 0.66, 0.57, 0.4]
    for i, e in enumerate(expected):
        assert got[i] == pytest.approx(e, abs=1e-2)


def test_closeness_wasserman_faust_disconnected(spark):
    # two 3-lines: component(v) counts OTHER reachable nodes, so for a
    # line end: comp=2, farness=1+2=3 → cc=2/3; WF scales by
    # (comp-1)/(n-1) = 1/5 (MSBFSCCAlgorithm.java:49-57)
    edges = make_edges(
        spark, [(0, 1), (1, 0), (1, 2), (2, 1), (3, 4), (4, 3), (4, 5), (5, 4)]
    )
    plain = {r["id"]: r["centrality"]
             for r in closeness_centrality(_v(spark, 6), edges).collect()}
    wf = {r["id"]: r["centrality"]
          for r in closeness_centrality(_v(spark, 6), edges,
                                        wasserman_faust=True).collect()}
    for end in (0, 2, 3, 5):
        assert plain[end] == pytest.approx(2 / 3)
        assert wf[end] == pytest.approx((2 / 3) * (1 / 5))
    for mid in (1, 4):
        assert plain[mid] == pytest.approx(1.0)
        assert wf[mid] == pytest.approx(1.0 * (1 / 5))


def test_closeness_sampled_estimator(spark):
    # full sample (fraction ~1 but < 1.0 path) must stay near exact on
    # a symmetric graph; scale = n/|sample| corrects the sums
    edges = make_edges(
        spark, [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 0), (0, 3)]
    )
    exact = {r["id"]: r["centrality"]
             for r in closeness_centrality(_v(spark, 4), edges).collect()}
    approx = {r["id"]: r["centrality"]
              for r in closeness_centrality(
                  _v(spark, 4), edges, sample_fraction=0.999, seed=7
              ).collect()}
    for i in exact:
        assert approx[i] == pytest.approx(exact[i], rel=0.34)


def test_closeness_exact_guard(spark, monkeypatch):
    from neo4j_graph_algorithms_spark.operators import closeness as mod

    monkeypatch.setattr(mod, "MAX_EXACT_SOURCES", 2)
    with pytest.raises(ValueError):
        closeness_centrality(_v(spark, 5), make_edges(spark, LINE5))
    # sampled mode still runs under the same cap
    res = closeness_centrality(_v(spark, 5), make_edges(spark, LINE5),
                               sample_fraction=0.8, seed=1)
    assert res.count() == 5


def test_harmonic_line3(spark):
    # A-B-C bidirectional: harmonic(B) = (1+1)/2 = 1, A/C = (1+0.5)/2
    edges = make_edges(spark, [(0, 1), (1, 0), (1, 2), (2, 1)])
    got = {r["id"]: r["centrality"]
           for r in harmonic_centrality(_v(spark, 3), edges).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[0] == pytest.approx(0.75)
    assert got[2] == pytest.approx(0.75)


def test_harmonic_uses_both_direction(spark):
    # directed 0→1: BOTH-direction BFS sees it undirected
    edges = make_edges(spark, [(0, 1)])
    got = {r["id"]: r["centrality"]
           for r in harmonic_centrality(_v(spark, 2), edges).collect()}
    assert got[0] == pytest.approx(1.0) and got[1] == pytest.approx(1.0)


def test_dangalchev_line3(spark):
    # directed line 0→1→2: farness accumulated over sources reaching v
    # (OUTGOING): v=1 gets 2^-1 from 0; v=2 gets 2^-1 (from 1) + 2^-2
    # (from 0); v=0 unreachable → 0
    edges = make_edges(spark, [(0, 1), (1, 2)])
    got = {r["id"]: r["centrality"]
           for r in dangalchev_centrality(_v(spark, 3), edges).collect()}
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(0.5)
    assert got[2] == pytest.approx(0.75)


# BetweennessCentralityTest2.java fixture: names a..g = ids 0..6
BETW_EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)]
BETW_EXPECTED = {0: 0.0, 1: 0.0, 2: 8.0, 3: 9.0, 4: 8.0, 5: 0.0, 6: 0.0}


def test_betweenness_fixture(spark):
    res = betweenness_centrality(_v(spark, 7), make_edges(spark, BETW_EDGES))
    got = {r["id"]: r["centrality"] for r in res.collect()}
    for i, e in BETW_EXPECTED.items():
        assert got[i] == pytest.approx(e, abs=1e-9), f"node {i}"


def test_betweenness_vs_python_oracle_random(spark):
    import itertools
    import numpy as np

    rng = np.random.RandomState(11)
    n = 30
    edges = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, n, size=(120, 2)) if a != b})

    # plain-python directed Brandes oracle
    adj = {u: [] for u in range(n)}
    for a, b in edges:
        adj[a].append(b)
    cb = [0.0] * n
    for s in range(n):
        sigma = [0.0] * n
        dist = [-1] * n
        preds = [[] for _ in range(n)]
        sigma[s] = 1.0
        dist[s] = 0
        stack, queue = [], [s]
        while queue:
            u = queue.pop(0)
            stack.append(u)
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    queue.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = [0.0] * n
        for w in reversed(stack):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                cb[w] += delta[w]

    res = betweenness_centrality(
        _v(spark, n), make_edges(spark, [(a, b, 1.0) for a, b in edges])
    )
    got = {r["id"]: r["centrality"] for r in res.collect()}
    for i in range(n):
        assert got[i] == pytest.approx(cb[i], abs=1e-9), f"node {i}"


def test_betweenness_sampled_scales(spark):
    # sample_fraction=1.0 → exact; a real fraction stays close on a
    # symmetric graph (smoke: non-negative, right schema)
    res = betweenness_centrality(
        _v(spark, 7), make_edges(spark, BETW_EDGES), sample_fraction=0.99,
        seed=3,
    )
    got = {r["id"]: r["centrality"] for r in res.collect()}
    assert all(v >= 0.0 for v in got.values())


def _python_brandes(n, edges, sources=None, max_depth=None, scale=1.0):
    """Plain-python directed Brandes with optional source subset, depth
    cap (MaxDepthBetweennessCentrality.java semantics: levels past the
    cap contribute nothing) and RA-Brandes scaling."""
    adj = {u: [] for u in range(n)}
    for a, b in edges:
        adj[a].append(b)
    cb = [0.0] * n
    for s in (range(n) if sources is None else sources):
        sigma = [0.0] * n
        dist = [-1] * n
        preds = [[] for _ in range(n)]
        sigma[s] = 1.0
        dist[s] = 0
        stack, queue = [], [s]
        while queue:
            u = queue.pop(0)
            stack.append(u)
            # depth-maxDepth nodes stay on the stack (they credit their
            # predecessors in the reverse sweep) but are not expanded —
            # in the reference their expansions only write dead state
            # into never-popped depth-maxDepth+1 nodes
            if max_depth is not None and dist[u] >= max_depth:
                continue
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    queue.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = [0.0] * n
        for w in reversed(stack):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                cb[w] += delta[w] * scale
    return cb


def test_betweenness_max_depth_vs_python(spark):
    import numpy as np

    rng = np.random.RandomState(23)
    n = 25
    edges = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, n, size=(100, 2)) if a != b})
    for depth in (0, 1, 2, 4):
        cb = _python_brandes(n, edges, max_depth=depth)
        res = betweenness_centrality(
            _v(spark, n), make_edges(spark, [(a, b, 1.0) for a, b in edges]),
            max_depth=depth,
        )
        got = {r["id"]: r["centrality"] for r in res.collect()}
        for i in range(n):
            assert got[i] == pytest.approx(cb[i], abs=1e-9), \
                f"depth {depth} node {i}"


def test_betweenness_max_depth_large_cap_equals_exact(spark):
    # a cap beyond the diameter must be a no-op
    exact = betweenness_centrality(
        _v(spark, 7), make_edges(spark, BETW_EDGES))
    capped = betweenness_centrality(
        _v(spark, 7), make_edges(spark, BETW_EDGES), max_depth=50)
    a = {r["id"]: r["centrality"] for r in exact.collect()}
    b = {r["id"]: r["centrality"] for r in capped.collect()}
    assert a == b


def test_betweenness_degree_strategy_vs_python(spark):
    """strategy='degree' (RandomDegreeSelectionStrategy.java): replay
    the deterministic md5 Bernoulli p=deg/maxDeg selection and the
    uniform f=n/|sample| scaling in plain python."""
    import hashlib

    import numpy as np

    rng = np.random.RandomState(7)
    n = 40
    edges = sorted({(int(a), int(b))
                    for a, b in rng.randint(0, n, size=(200, 2)) if a != b})
    deg = [0] * n
    for a, _ in edges:
        deg[a] += 1
    maxdeg = max(deg)
    seed = 42

    def h8(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    sources = [v for v in range(n)
               if (h8(f"{v}#btwdeg{seed}") % (1 << 20)) * maxdeg
               < deg[v] * (1 << 20)]
    assert sources, "selection must be non-empty on this fixture"
    cb = _python_brandes(n, edges, sources=sources, scale=n / len(sources))

    res = betweenness_centrality(
        _v(spark, n), make_edges(spark, [(a, b, 1.0) for a, b in edges]),
        strategy="degree", seed=seed,
    )
    got = {r["id"]: r["centrality"] for r in res.collect()}
    for i in range(n):
        assert got[i] == pytest.approx(cb[i], abs=1e-9), f"node {i}"


def test_betweenness_degree_strategy_empty_graph(spark):
    res = betweenness_centrality(
        _v(spark, 5), make_edges(spark, []), strategy="degree")
    got = {r["id"]: r["centrality"] for r in res.collect()}
    assert got == {i: 0.0 for i in range(5)}


def test_betweenness_unknown_strategy_rejected(spark):
    with pytest.raises(ValueError):
        betweenness_centrality(
            _v(spark, 3), make_edges(spark, BETW_EDGES), strategy="best")


# ---- HITS (engine extension) -------------------------------------------

HITS_EDGES = [(0, 3, 1.0), (0, 4, 1.0), (1, 3, 1.0), (1, 4, 1.0),
              (2, 4, 1.0), (4, 5, 1.0)]


def test_hits_matches_numpy_power_iteration(spark):
    # independent oracle: dense numpy alternating power iteration with
    # the same init (1/n) and per-half-step L2 normalization
    import numpy as np
    from neo4j_graph_algorithms_spark.operators.centrality_variants import hits

    n, iters = 6, 12
    A = np.zeros((n, n))
    for s, d, _ in HITS_EDGES:
        A[s, d] = 1.0
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(iters):
        auth = A.T @ hub
        l2 = np.sqrt((auth ** 2).sum()) or 1.0
        auth = auth / l2
        hub = A @ auth
        l2 = np.sqrt((hub ** 2).sum()) or 1.0
        hub = hub / l2

    res = hits(_v(spark, n), make_edges(spark, HITS_EDGES),
               max_iterations=iters)
    got = {r["id"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
    assert res.iterations == iters
    for i in range(n):
        assert got[i][0] == pytest.approx(hub[i], abs=1e-9), f"hub {i}"
        assert got[i][1] == pytest.approx(auth[i], abs=1e-9), f"auth {i}"
    # structure: 0 and 1 are the best hubs (point at both authorities);
    # 4 is the top authority (3 in-links)
    assert got[0][0] == pytest.approx(got[1][0])
    assert got[0][0] > got[2][0] > got[3][0]
    assert got[4][1] > got[3][1] > got[0][1]


def test_hits_tolerance_converges(spark):
    from neo4j_graph_algorithms_spark.operators.centrality_variants import hits

    res = hits(_v(spark, 6), make_edges(spark, HITS_EDGES),
               max_iterations=50, tol=1e-9)
    assert res.converged
    assert res.iterations < 50


def test_salsa_stationary_is_degree_proportional(spark):
    """Lempel & Moran: on a connected aperiodic graph SALSA's authority
    chain is a random walk whose stationary distribution is
    in_deg/|E| (and the hub chain's is out_deg/|E|) — run the power
    iteration long enough and the scores must land there."""
    from neo4j_graph_algorithms_spark.operators.centrality_variants import (
        salsa,
    )

    # strongly connected, aperiodic (self-reinforcing 0->1->2->0 plus
    # chords), with skewed degrees
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 1), (3, 0), (0, 3),
             (1, 0)]
    res = salsa(_v(spark, 4), make_edges(spark, edges),
                max_iterations=60, tol=1e-12)
    got = {r["id"]: (r["hub"], r["authority"])
           for r in res.scores.collect()}
    m = len(edges)
    outd = {0: 3, 1: 2, 2: 2, 3: 1}
    ind = {0: 3, 1: 2, 2: 2, 3: 1}
    for i in range(4):
        assert got[i][0] == pytest.approx(outd[i] / m, abs=1e-6), f"hub {i}"
        assert got[i][1] == pytest.approx(ind[i] / m, abs=1e-6), f"auth {i}"
    assert res.converged
