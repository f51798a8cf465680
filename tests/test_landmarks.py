"""Landmark distance estimation vs brute-force BFS replays."""

import random
from collections import deque

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.landmarks import (
    estimate_distances,
    landmark_distance_index,
)


def _bfs(adj, s):
    dist = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):  # noqa: B905
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _random_graph(rng, n, p):
    pairs = {(a, b) for a in range(n) for b in range(n)
             if a != b and rng.random() < p}
    fwd, bwd = {}, {}
    for a, b in pairs:
        fwd.setdefault(a, []).append(b)
        bwd.setdefault(b, []).append(a)
    return pairs, fwd, bwd


def test_estimates_match_bruteforce_min_plus(spark):
    rng = random.Random(5)
    n, landmarks = 40, [0, 7, 13]
    pairs, fwd, bwd = _random_graph(rng, n, 0.08)
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    idx = landmark_distance_index(verts, edges, landmarks)
    qp = [(a, b) for a in range(0, n, 3) for b in range(1, n, 7) if a != b]
    qdf = spark.createDataFrame(qp, "src long, dst long")
    got = {(r["src"], r["dst"]): r["dist_est"]
           for r in estimate_distances(qdf, idx).collect()}

    d_from = {l: _bfs(fwd, l) for l in landmarks}   # d(l -> v)
    d_to = {l: _bfs(bwd, l) for l in landmarks}     # d(u -> l)
    for a, b in qp:
        cands = [d_to[l][a] + d_from[l][b] for l in landmarks
                 if a in d_to[l] and b in d_from[l]]
        if cands:
            assert got[(a, b)] == min(cands), (a, b)
        else:
            assert (a, b) not in got


def test_estimate_is_upper_bound_and_exact_with_all_landmarks(spark):
    rng = random.Random(9)
    n = 25
    pairs, fwd, _ = _random_graph(rng, n, 0.12)
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    idx = landmark_distance_index(verts, edges, list(range(n)))
    qp = [(a, b) for a in range(n) for b in range(n) if a != b]
    qdf = spark.createDataFrame(qp, "src long, dst long")
    got = {(r["src"], r["dst"]): r["dist_est"]
           for r in estimate_distances(qdf, idx).collect()}
    for a in range(n):
        true_d = _bfs(fwd, a)
        for b in range(n):
            if a == b:
                continue
            if b in true_d:
                # src itself is a landmark -> the bound is tight
                assert got[(a, b)] == true_d[b], (a, b)
            else:
                assert (a, b) not in got


def test_max_depth_truncates_index(spark):
    # path 0 -> 1 -> ... -> 5, landmark 0, depth 2: only 3 hops indexed
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(6)], "id long")
    idx = landmark_distance_index(verts, edges, [0], max_depth=2)
    d = {r["id"]: r["d_from"] for r in
         idx.filter(F.col("d_from").isNotNull()).collect()}
    assert d == {0: 0, 1: 1, 2: 2}
