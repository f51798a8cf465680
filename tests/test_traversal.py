"""BFS / SSSP / random-walk operators + centrality variants + scalar
functions."""

import pytest

from pyspark.sql import functions as F

from tests.conftest import make_edges
from neo4j_graph_algorithms_spark.operators.traversal import (
    bfs_distances,
    dfs_order,
    random_walks,
    sssp,
)
from neo4j_graph_algorithms_spark.operators.centrality_variants import (
    articlerank,
    eigenvector_centrality,
)
from neo4j_graph_algorithms_spark.functions import (
    is_finite,
    is_infinite,
    one_hot,
    get_nodes_by_id,
)


def _v(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "id long")


def test_bfs_distances(spark):
    # 0→1→2→3, 0→4, 5 unreachable
    e = make_edges(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 4, 1.0)])
    got = {r["id"]: r["distance"]
           for r in bfs_distances(_v(spark, 6), e, 0).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1}


def test_bfs_max_depth(spark):
    e = make_edges(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)])
    got = {r["id"]: r["distance"]
           for r in bfs_distances(_v(spark, 4), e, 0, max_depth=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def _dfs_steps(df):
    return [r["id"] for r in df.orderBy("step").collect()]


def test_dfs_order_reference_semantics(spark):
    # 0→{1,2}, 1→3, 2→4: neighbors pushed front in ascending order, so
    # the LARGEST unvisited neighbor pops first (Traverse.java addFirst)
    e = make_edges(spark, [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 4, 1.0)])
    assert _dfs_steps(dfs_order(_v(spark, 5), e, 0)) == [0, 2, 4, 1, 3]


def test_dfs_visited_at_push(spark):
    # diamond 0→{1,2}, 1→3, 2→3: 3 is claimed at push time by the first
    # pusher (2, visited first), never re-emitted via 1
    e = make_edges(spark, [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0)])
    assert _dfs_steps(dfs_order(_v(spark, 4), e, 0)) == [0, 2, 3, 1]


def test_dfs_max_depth_and_target(spark):
    # chain 0→1→2→3: maxDepth=2 prunes depth>=2 (emitted: depth 0,1)
    e = make_edges(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)])
    assert _dfs_steps(dfs_order(_v(spark, 4), e, 0, max_depth=2)) == [0, 1]
    # BREAK: target emitted, walk stops
    assert _dfs_steps(dfs_order(_v(spark, 4), e, 0, target_nodes=[2])) == \
        [0, 1, 2]


def test_dfs_max_nodes_guard(spark):
    e = make_edges(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    with pytest.raises(ValueError):
        dfs_order(_v(spark, 3), e, 0, max_nodes=1)


def test_dfs_max_edges_guard(spark):
    # dense fixture: node count passes the max_nodes gate but the
    # induced edge set exceeds max_edges — the collect must refuse
    # (a dense 100k-node reachable subgraph can carry 10^9+ edges)
    n = 12
    e = make_edges(spark, [(i, j, 1.0) for i in range(n)
                           for j in range(n) if i != j])
    with pytest.raises(ValueError, match="max_edges"):
        dfs_order(_v(spark, n), e, 0, max_nodes=100, max_edges=50)
    # and passes when the bound accommodates the graph
    out = dfs_order(_v(spark, n), e, 0, max_nodes=100,
                    max_edges=n * (n - 1))
    assert out.count() == n


def _hav_nm(lat1, lon1, lat2, lon2):
    import math

    lat_d = math.radians(lat2 - lat1)
    lon_d = math.radians(lon2 - lon1)
    a = (math.sin(lat_d / 2) ** 2
         + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
         * math.sin(lon_d / 2) ** 2)
    return 6371.0 * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a)) * 0.539957


def test_astar_matches_dijkstra_on_geo_graph(spark):
    from neo4j_graph_algorithms_spark.operators.traversal import (
        shortest_path,
        shortest_path_astar,
    )

    # 6 cities on a line of longitude plus a detour; weights = exact
    # haversine NM (admissible heuristic regime, the reference contract)
    coords = {0: (0.0, 0.0), 1: (1.0, 0.0), 2: (2.0, 0.0), 3: (3.0, 0.0),
              4: (1.0, 5.0), 5: (2.0, 5.0)}
    ed = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 3)]
    rows = [(s, d, _hav_nm(*coords[s], *coords[d])) for s, d in ed]
    e = make_edges(spark, rows)
    v = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in coords.items()],
        "id long, lat double, lon double")
    plain = shortest_path(v.select("id"), e, 0, 3).orderBy("step").collect()
    astar = shortest_path_astar(v, e, 0, 3).orderBy("step").collect()
    assert [r["id"] for r in astar] == [r["id"] for r in plain] == [0, 1, 2, 3]
    assert astar[-1]["cost"] == pytest.approx(plain[-1]["cost"])


def test_astar_unreachable_target(spark):
    from neo4j_graph_algorithms_spark.operators.traversal import (
        shortest_path_astar,
    )

    e = make_edges(spark, [(0, 1, 1.0)])
    v = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 2.0, 0.0)],
        "id long, lat double, lon double")
    assert shortest_path_astar(v, e, 0, 2).count() == 0


def test_all_shortest_paths_weighted(spark):
    from neo4j_graph_algorithms_spark.operators.traversal import (
        all_shortest_paths,
    )

    ed = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (2, 0, 1.0), (1, 3, 7.0),
          (2, 3, 1.0)]
    e = make_edges(spark, ed)
    got = {(r["source"], r["id"]): r["cost"]
           for r in all_shortest_paths(_v(spark, 4), e).collect()}
    # floyd-warshall oracle
    import itertools
    INF = float("inf")
    d = {(i, j): (0.0 if i == j else INF) for i in range(4) for j in range(4)}
    for s_, t_, w_ in ed:
        d[(s_, t_)] = min(d[(s_, t_)], w_)
    for k_, i, j in itertools.product(range(4), repeat=3):
        d[(i, j)] = min(d[(i, j)], d[(i, k_)] + d[(k_, j)])
    expect = {k: v for k, v in d.items() if v < INF}
    assert got == {k: pytest.approx(v) for k, v in expect.items()}


def test_all_shortest_paths_source_guard(spark):
    from neo4j_graph_algorithms_spark.operators.traversal import (
        all_shortest_paths,
    )

    e = make_edges(spark, [(0, 1, 1.0)])
    with pytest.raises(ValueError):
        all_shortest_paths(_v(spark, 3), e, max_sources=2)


def _all_simple_paths(adj, s, t):
    """Brute-force oracle: every simple s→t path with its total cost."""
    out = []

    def walk(v, path, cost):
        if v == t:
            out.append((cost, list(path)))
            return
        for u, w in sorted(adj.get(v, [])):
            if u not in path:
                path.append(u)
                walk(u, path, cost + w)
                path.pop()

    walk(s, [s], 0.0)
    return sorted(out, key=lambda p: (p[0], p[1]))


def test_yens_k_shortest_paths(spark):
    from neo4j_graph_algorithms_spark.operators.yens import k_shortest_paths

    # small weighted digraph with several distinct s->t routes
    ed = [(0, 1, 1.0), (1, 3, 1.0), (0, 2, 2.0), (2, 3, 1.0),
          (1, 2, 0.5), (0, 3, 5.0), (2, 4, 1.0), (4, 3, 1.0)]
    e = make_edges(spark, ed)
    adj = {}
    for s_, d_, w_ in ed:
        adj.setdefault(s_, []).append((d_, w_))
    oracle = _all_simple_paths(adj, 0, 3)[:3]
    res = k_shortest_paths(_v(spark, 5), e, 0, 3, 3)
    assert res.path_count == 3
    rows = res.paths.orderBy("path_index", "step").collect()
    got = {}
    for r in rows:
        got.setdefault(r["path_index"], ([], r["path_cost"]))[0].append(r["id"])
    for pi, (ocost, opath) in enumerate(oracle):
        path, cost = got[pi]
        assert cost == pytest.approx(ocost)
        assert path == opath


def test_sssp_weighted(spark):
    # 0→1 (1), 1→2 (1), 0→2 (5): shortest 0→2 is 2 via 1
    e = make_edges(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)])
    got = {r["id"]: r["cost"] for r in sssp(_v(spark, 3), e, 0).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_sssp_relaxation_beats_greedy(spark):
    # longer-hop cheaper path found after multiple rounds
    e = make_edges(spark, [(0, 1, 10.0), (0, 2, 1.0), (2, 3, 1.0),
                           (3, 1, 1.0)])
    got = {r["id"]: r["cost"] for r in sssp(_v(spark, 4), e, 0).collect()}
    assert got[1] == 3.0


def test_random_walks_deterministic(spark):
    e = make_edges(spark, [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0),
                           (2, 0, 1.0)])
    a = random_walks(_v(spark, 3), e, walk_length=4).collect()
    b = random_walks(_v(spark, 3), e, walk_length=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every step follows an existing edge
    edges = {(0, 1), (1, 0), (1, 2), (2, 0)}
    byw = {}
    for r in a:
        byw.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    for steps in byw.values():
        for s in range(1, max(steps)):
            if s in steps and s + 1 in steps:
                assert (steps[s], steps[s + 1]) in edges


def test_articlerank_ordering_matches_pagerank_shape(spark):
    # hub b still ranks highest; all scores finite and > alpha*0.9
    pairs = [("b", "c"), ("c", "b"), ("d", "a"), ("d", "b"), ("e", "b")]
    names = list("abcde")
    e = make_edges(spark, pairs, names)
    res = articlerank(_v(spark, 5), e, max_iterations=30, tol=1e-8)
    got = {r["id"]: r["score"] for r in res.scores.collect()}
    assert max(got, key=got.get) == 1  # b
    assert res.converged


def test_eigenvector_centrality_cycle(spark):
    # symmetric cycle → uniform eigenvector
    e = make_edges(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
                           (1, 0, 1.0), (2, 1, 1.0), (0, 2, 1.0)])
    res = eigenvector_centrality(_v(spark, 3), e, max_iterations=30,
                                 tol=1e-10, normalization="max")
    got = [r["score"] for r in res.scores.collect()]
    assert all(s == pytest.approx(1.0, abs=1e-6) for s in got)


def test_scalar_functions(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("inf"),), (float("nan"),)], "x double"
    )
    rows = df.select(
        is_finite(F.col("x")).alias("f"), is_infinite(F.col("x")).alias("i")
    ).collect()
    assert [r["f"] for r in rows] == [True, False, False]
    assert [r["i"] for r in rows] == [False, True, False]

    oh = spark.createDataFrame(
        [(["a", "b", "c"], ["c", "a"])], "avail array<string>, sel array<string>"
    ).select(one_hot(F.col("avail"), F.col("sel")).alias("v")).first()
    assert oh["v"] == [1, 0, 1]

    v = _v(spark, 5)
    assert {r["id"] for r in get_nodes_by_id(v, [1, 3]).collect()} == {1, 3}


def test_shortest_path_pair(spark):
    from neo4j_graph_algorithms_spark.operators.traversal import shortest_path

    # 0→1 (1), 1→3 (1), 0→2 (5), 2→3 (1): best 0→1→3 cost 2
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 3, 1.0), (0, 2, 5.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    rows = shortest_path(v, e, 0, 3).orderBy("step").collect()
    assert [(r["id"], r["cost"]) for r in rows] == [(0, 0.0), (1, 1.0), (3, 2.0)]
    # unreachable pair → empty
    assert shortest_path(v, e, 3, 0).count() == 0


def test_node2vec_walks_structure(spark):
    from neo4j_graph_algorithms_spark.operators.traversal import node2vec_walks

    v = spark.createDataFrame([(i,) for i in range(6)], "id long")
    pairs = [(i, j) for i in range(6) for j in range(6) if i != j]
    e = spark.createDataFrame(pairs, "src long, dst long")
    walks = node2vec_walks(v, e, walk_length=4, return_param=2.0, in_out=0.5,
                           seed=7)
    rows = walks.orderBy("walk_id", "step").collect()
    byw = {}
    for r in rows:
        byw.setdefault(r["walk_id"], []).append(r["node"])
    eset = set(pairs)
    for seq in byw.values():
        assert len(seq) == 5
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in eset
    # deterministic
    again = node2vec_walks(v, e, walk_length=4, return_param=2.0, in_out=0.5,
                           seed=7).orderBy("walk_id", "step").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_node2vec_never_returns_when_p_huge(spark):
    from neo4j_graph_algorithms_spark.operators.traversal import node2vec_walks

    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    pairs = [(i, j) for i in range(5) for j in range(5) if i != j]
    e = spark.createDataFrame(pairs, "src long, dst long")
    walks = node2vec_walks(v, e, walk_length=6, return_param=1e12, in_out=1.0)
    byw = {}
    for r in walks.collect():
        byw.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    for seq in byw.values():
        nodes = [seq[s] for s in sorted(seq)]
        for i in range(2, len(nodes)):
            assert nodes[i] != nodes[i - 2] or len(set(nodes)) == 1


def test_walk_skipgram_pairs_python_replay(spark):
    """Pair counts over hand-built walk sequences: window semantics,
    ordered-pair keying, self-pair (revisit) handling."""
    from collections import Counter

    from neo4j_graph_algorithms_spark.operators.traversal import (
        walk_skipgram_pairs,
    )

    seqs = {10: [1, 2, 3, 2], 11: [5, 5, 6], 12: [7]}
    rows = [(w, s, n) for w, seq in seqs.items()
            for s, n in enumerate(seq)]
    walks = spark.createDataFrame(rows, "walk_id long, step int, node long")
    got = {(r["node_a"], r["node_b"]): r["n_pair"]
           for r in walk_skipgram_pairs(walks, window=2).collect()}
    exp = Counter()
    for seq in seqs.values():
        for i in range(len(seq)):
            for j in range(i + 1, min(i + 2, len(seq) - 1) + 1):
                exp[tuple(sorted((seq[i], seq[j])))] += 1
    assert got == dict(exp)
    assert got[(5, 5)] == 1  # revisit within window → self-pair


def test_weighted_walks_equal_uniform_when_weights_one(spark):
    from neo4j_graph_algorithms_spark.operators.traversal import (
        random_walks, random_walks_weighted,
    )
    pairs = [(i, (i + j) % 12) for i in range(12) for j in (1, 2, 3)]
    v = spark.createDataFrame([(i,) for i in range(12)], "id long")
    e = make_edges(spark, pairs)  # weight defaults to 1.0
    uni = {(r.walk_id, r.step): r.node
           for r in random_walks(v, e, walk_length=4).collect()}
    wtd = {(r.walk_id, r.step): r.node
           for r in random_walks_weighted(v, e, walk_length=4).collect()}
    # pick = pmod(hash, W_u) with W_u == deg indexes the same dst-ordered
    # adjacency → bit-identical trajectories
    assert uni == wtd


def test_weighted_walks_match_python_interval_replay(spark):
    """Property check of the r4 packed-interval rewrite on a random
    weighted digraph: replay the walk in plain python from (a) the
    same Murmur3 draws (evaluated once via a tiny Spark expression —
    the only shared primitive) and (b) an independent implementation
    of the cumulative-interval rule over the dst-ordered adjacency.
    Every (walk_id, step, node) must match exactly."""
    import numpy as np
    from pyspark.sql import functions as F

    from neo4j_graph_algorithms_spark.operators.traversal import (
        random_walks_weighted,
    )

    rng = np.random.RandomState(5)
    n, wpn, length, seed = 30, 2, 5, 9
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.randint(0, n, size=(150, 2)) if a != b})
    weights = {p: int(rng.randint(1, 6)) for p in edges}
    e = make_edges(spark, [(a, b, float(weights[(a, b)]))
                           for a, b in edges])
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {(r.walk_id, r.step): r.node
           for r in random_walks_weighted(
               v, e, walks_per_node=wpn, walk_length=length,
               seed=seed).collect()}

    # the Murmur3 draws, evaluated by Spark once for every (walk, step)
    draws = {}
    wdf = spark.range(n * wpn).select(F.col("id").alias("walk_id"))
    for s in range(1, length + 1):
        for r in wdf.select(
                "walk_id",
                F.hash(F.col("walk_id"), F.lit(s), F.lit(seed))
                .alias("h")).collect():
            draws[(r["walk_id"], s)] = r["h"]

    adj = {}
    for (a, b) in edges:
        adj.setdefault(a, []).append((b, weights[(a, b)]))
    for a in adj:
        adj[a].sort()
    exp = {}
    for wid in range(n * wpn):
        node = wid // wpn
        exp[(wid, 0)] = node
        for s in range(1, length + 1):
            cand = adj.get(node)
            if not cand:
                break
            total = sum(w for _, w in cand)
            pick = ((draws[(wid, s)] % total) + total) % total
            acc = 0
            for dst, w in cand:
                acc += w
                if pick < acc:
                    node = dst
                    break
            exp[(wid, s)] = node
    assert got == exp


def test_weighted_walks_follow_weights_and_stop_at_dead_ends(spark):
    from neo4j_graph_algorithms_spark.operators.traversal import (
        random_walks_weighted,
    )
    # node 0 → 1 with weight 999, 0 → 2 with weight 1; 1 and 2 dead-end
    e = make_edges(spark, [(0, 1, 999.0), (0, 2, 1.0)])
    v = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    out = random_walks_weighted(v, e, walks_per_node=200,
                                walk_length=1).collect()
    step1 = [r.node for r in out if r.step == 1]
    # only walkers starting at 0 take a step (1, 2 are dead ends)
    assert len(step1) == 200
    frac = sum(1 for n in step1 if n == 1) / len(step1)
    assert frac > 0.97  # 999/1000 expected; deterministic given the seed
    # every step-1 node is an out-neighbor of 0
    assert set(step1) <= {1, 2}
    # deterministic
    again = random_walks_weighted(v, e, walks_per_node=200,
                                  walk_length=1).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
