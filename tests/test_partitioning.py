"""Multilevel bisection (operators/partitioning.py)."""

import numpy as np

from neo4j_graph_algorithms_spark.operators.partitioning import (
    multilevel_bisect,
)


def _run(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    return multilevel_bisect(e, **kw)


def test_total_and_binary(spark):
    rng = np.random.default_rng(4)
    edges = [(int(rng.integers(40)), int(rng.integers(40)))
             for _ in range(150)]
    edges = [(s, d) for s, d in edges if s != d]
    res = _run(spark, edges)
    labs = {r.id: r.part for r in res.labels.collect()}
    verts = {v for t in edges for v in t}
    assert set(labs) == verts                 # every vertex labeled
    assert set(labs.values()) <= {0, 1}
    assert sum(res.part_sizes.values()) == len(verts)


def test_edge_cut_matches_labels(spark):
    rng = np.random.default_rng(8)
    edges = sorted({(int(rng.integers(25)), int(rng.integers(25)))
                    for _ in range(80)})
    edges = [(s, d) for s, d in edges if s != d]
    res = _run(spark, edges)
    labs = {r.id: r.part for r in res.labels.collect()}
    canon = {(min(s, d), max(s, d)) for s, d in edges}
    want = sum(1 for a, b in canon if labs[a] != labs[b])
    assert res.edge_cut == want


def test_matched_pairs_colocate_at_one_level(spark):
    """With one level, a matched pair shares a supervertex, hence a
    part — the coarsening must keep contracted pairs together."""
    from neo4j_graph_algorithms_spark.operators.matching import (
        maximal_matching,
    )

    rng = np.random.default_rng(12)
    edges = sorted({(int(rng.integers(20)), int(rng.integers(20)))
                    for _ in range(50)})
    edges = [(s, d) for s, d in edges if s != d]
    e = spark.createDataFrame(edges, "src long, dst long")
    res = multilevel_bisect(e, levels=1)
    labs = {r.id: r.part for r in res.labels.collect()}
    m = maximal_matching(e, seed=43, max_rounds=6).matching
    for r in m.collect():
        assert labs[r.u] == labs[r.v]


def test_deterministic(spark):
    edges = [(i, (i * 3 + 1) % 17) for i in range(17)]
    edges = [(s, d) for s, d in edges if s != d]
    a = sorted((r.id, r.part) for r in
               _run(spark, edges).labels.collect())
    b = sorted((r.id, r.part) for r in
               _run(spark, edges).labels.collect())
    assert a == b


def test_balance_within_one(spark):
    # rank-parity split: sizes differ by at most ... the projection can
    # skew counts (supervertices carry 1-2 vertices), but with a
    # perfect matching the skew is bounded by the largest supervertex
    edges = [(i, i + 1) for i in range(0, 20, 2)]   # 10 disjoint pairs
    res = _run(spark, edges, levels=1)
    sizes = sorted(res.part_sizes.values())
    assert sizes == [10, 10]  # pairs contract; 10 supers split 5/5


def _cut(edges, labs):
    canon = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    return sum(1 for a, b in canon if labs[a] != labs[b])


def test_refinement_monotone_cut_and_balance(spark):
    from neo4j_graph_algorithms_spark.operators.partitioning import (
        refine_bisection,
    )

    rng = np.random.default_rng(6)
    edges = sorted({(int(rng.integers(30)), int(rng.integers(30)))
                    for _ in range(120)})
    edges = [(s, d) for s, d in edges if s != d]
    e = spark.createDataFrame(edges, "src long, dst long")
    res = _run(spark, edges)
    labs0 = {r.id: r.part for r in res.labels.collect()}
    cut0 = _cut(edges, labs0)
    gap0 = abs(sum(1 for p in labs0.values() if p == 1)
               - sum(1 for p in labs0.values() if p == 0))
    prev_labs, prev_cut = labs0, cut0
    for rounds in (1, 2, 4):
        labs = {r.id: r.part for r in
                refine_bisection(res.labels, e, rounds=rounds).collect()}
        cut = _cut(edges, labs)
        assert cut <= prev_cut          # monotone non-increasing
        gap = abs(sum(1 for p in labs.values() if p == 1)
                  - sum(1 for p in labs.values() if p == 0))
        assert gap <= max(gap0, 2)      # one-flip tolerance bound
        prev_cut = cut
    # refinement actually helps on this graph
    assert prev_cut < cut0


def test_refinement_no_adjacent_flips(spark):
    """Flipped vertices form an independent set per round — realized
    gain equals computed gain (the monotonicity argument)."""
    from neo4j_graph_algorithms_spark.operators.partitioning import (
        refine_bisection,
    )

    rng = np.random.default_rng(15)
    edges = sorted({(int(rng.integers(20)), int(rng.integers(20)))
                    for _ in range(60)})
    edges = [(s, d) for s, d in edges if s != d]
    e = spark.createDataFrame(edges, "src long, dst long")
    res = _run(spark, edges)
    labs0 = {r.id: r.part for r in res.labels.collect()}
    labs1 = {r.id: r.part for r in
             refine_bisection(res.labels, e, rounds=1).collect()}
    flipped = {v for v in labs0 if labs0[v] != labs1[v]}
    for s, d in edges:
        assert not (s in flipped and d in flipped)


def test_kway_partition(spark):
    from neo4j_graph_algorithms_spark.operators.partitioning import (
        partition_kway,
    )

    rng = np.random.default_rng(2)
    edges = sorted({(int(rng.integers(32)), int(rng.integers(32)))
                    for _ in range(140)})
    edges = [(s, d) for s, d in edges if s != d]
    e = spark.createDataFrame(edges, "src long, dst long")
    labs = {r.id: r.part for r in
            partition_kway(e, 4, levels=1, rounds_per_level=4)
            .collect()}
    verts = {v for t in edges for v in t}
    assert set(labs) == verts
    assert set(labs.values()) <= {0, 1, 2, 3}
    # all four parts populated on a 32-vertex graph
    assert len(set(labs.values())) == 4


def test_kway_uneven_k_folds(spark):
    from neo4j_graph_algorithms_spark.operators.partitioning import (
        partition_kway,
    )

    edges = [(i, (i + 1) % 24) for i in range(24)]
    e = spark.createDataFrame(edges, "src long, dst long")
    labs = {r.id: r.part for r in
            partition_kway(e, 3, levels=1, rounds_per_level=4)
            .collect()}
    assert set(labs.values()) <= {0, 1, 2}
