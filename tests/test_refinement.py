"""Leiden-style connectivity refinement (operators/refinement.py)."""

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.refinement import (
    split_disconnected_communities,
)


def _run(spark, labels, edges):
    ldf = spark.createDataFrame(labels, "id long, community long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    res = split_disconnected_communities(ldf, edf)
    return {r.id: (r.community, r.refined_community)
            for r in res.labels.collect()}


def test_disconnected_community_splits(spark):
    # community 0 = {0,1} + {2,3} with NO edge between the halves
    labels = [(0, 0), (1, 0), (2, 0), (3, 0)]
    edges = [(0, 1), (2, 3)]
    out = _run(spark, labels, edges)
    assert out[0] == (0, 0) and out[1] == (0, 0)
    assert out[2] == (0, 2) and out[3] == (0, 2)


def test_connected_community_unchanged(spark):
    labels = [(0, 0), (1, 0), (2, 0)]
    edges = [(0, 1), (1, 2)]
    out = _run(spark, labels, edges)
    assert {v[1] for v in out.values()} == {0}


def test_cross_community_edges_ignored(spark):
    # 1-2 edge crosses communities: must NOT glue them
    labels = [(1, 10), (2, 20)]
    edges = [(1, 2)]
    out = _run(spark, labels, edges)
    assert out[1] == (10, 1) and out[2] == (20, 2)


def test_isolated_node_becomes_singleton(spark):
    labels = [(0, 0), (1, 0), (5, 0)]   # 5 has no intra edge
    edges = [(0, 1)]
    out = _run(spark, labels, edges)
    assert out[5] == (0, 5)


def test_direction_irrelevant(spark):
    # WCC semantics: a directed intra edge still connects
    labels = [(0, 0), (1, 0)]
    out_fwd = _run(spark, labels, [(0, 1)])
    out_rev = _run(spark, labels, [(1, 0)])
    assert out_fwd == out_rev


def test_refined_labels_unique_across_communities(spark):
    # two communities, both containing their min-id component:
    # refined ids are min MEMBER ids so they cannot collide
    labels = [(0, 100), (1, 100), (2, 200), (3, 200)]
    edges = [(0, 1), (2, 3)]
    ldf = spark.createDataFrame(labels, "id long, community long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    res = split_disconnected_communities(ldf, edf)
    pairs = (res.labels.select("community", "refined_community")
             .distinct().collect())
    refined_per_comm = {}
    for r in pairs:
        refined_per_comm.setdefault(r.refined_community, set()).add(
            r.community)
    for ref, comms in refined_per_comm.items():
        assert len(comms) == 1
