"""Graph-projection layer semantics (SURVEY.md §1.4): dedup strategies,
undirected merge, missing-endpoint filtering, id-map bijectivity —
mirrors the reference core tests (HeavyCypherGraphFactoryDeduplicationTest,
DegreesTest, DirectionFilteringTest, IdMapTest)."""

import pytest

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.graph import (
    as_undirected,
    build_graph,
    dedup_edges,
    degrees,
    id_map,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def test_dedup_strategies(spark):
    e = _edges(spark, [(0, 1, 2.0), (0, 1, 3.0), (1, 2, 1.0)])
    assert dedup_edges(e, "none").count() == 3
    assert dedup_edges(e, "skip").count() == 2
    got = {(r["src"], r["dst"]): r["weight"]
           for r in dedup_edges(e, "sum").collect()}
    assert got[(0, 1)] == 5.0
    assert {(r["src"], r["dst"]): r["weight"]
            for r in dedup_edges(e, "min").collect()}[(0, 1)] == 2.0
    assert {(r["src"], r["dst"]): r["weight"]
            for r in dedup_edges(e, "max").collect()}[(0, 1)] == 3.0


def test_as_undirected_merge_and_self_loop(spark):
    e = _edges(spark, [(0, 1, 1.0), (1, 0, 1.0), (2, 2, 1.0), (1, 2, 1.0)])
    und = as_undirected(e)
    pairs = {(r["src"], r["dst"]) for r in und.collect()}
    # both directions present once each; self-loop kept once
    assert pairs == {(0, 1), (1, 0), (2, 2), (1, 2), (2, 1)}


def test_degrees(spark):
    e = _edges(spark, [(0, 1, 2.0), (0, 2, 3.0), (1, 2, 1.0)])
    out = {r["id"]: r["degree"] for r in degrees(e, "out").collect()}
    assert out == {0: 2.0, 1: 1.0}
    win = {r["id"]: r["degree"] for r in degrees(e, "in", weighted=True).collect()}
    assert win == {1: 2.0, 2: 4.0}


def test_build_graph_missing_endpoint_filter(spark):
    # edges to nodes outside the projected set are dropped
    # (VisitRelationship.java:79-82)
    v = spark.createDataFrame([(0,), (1,)], "id long")
    e = _edges(spark, [(0, 1, 1.0), (0, 99, 1.0), (98, 1, 1.0)])
    g = build_graph(e, v)
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {(0, 1)}


def test_build_graph_direction_in(spark):
    e = _edges(spark, [(0, 1, 1.0)])
    g = build_graph(e, direction="in")
    assert [(r["src"], r["dst"]) for r in g.edges.collect()] == [(1, 0)]


def test_build_graph_default_weight(spark):
    e = spark.createDataFrame([(0, 1, None), (1, 2, 5.0)],
                              "src long, dst long, weight double")
    g = build_graph(e, default_weight=10.0)
    got = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert got == {(0, 1): 10.0, (1, 2): 5.0}


def test_id_map_dense_bijective(spark):
    e = spark.createDataFrame(
        [("u3", "u1"), ("u2", "u3"), ("u1", "u2")], "src string, dst string"
    )
    m = id_map(e)
    rows = m.collect()
    names = {r["name"] for r in rows}
    ids = sorted(r["id"] for r in rows)
    assert names == {"u1", "u2", "u3"}
    assert ids == [0, 1, 2]
    # deterministic: sorted by name
    by_name = {r["name"]: r["id"] for r in rows}
    assert by_name == {"u1": 0, "u2": 1, "u3": 2}


def test_graph_reversed_and_undirected(spark):
    e = _edges(spark, [(0, 1, 1.0)])
    g = build_graph(e)
    assert [(r["src"], r["dst"]) for r in g.reversed().edges.collect()] == [(1, 0)]
    und = g.undirected().edges
    assert {(r["src"], r["dst"]) for r in und.collect()} == {(0, 1), (1, 0)}


def test_edge_list_roundtrip_csv_json(spark, tmp_path):
    from neo4j_graph_algorithms_spark.sources.edgelist import (
        read_edge_list,
        write_edge_list,
    )

    edges = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 0.5), (2, 0, 1.0)],
        "src long, dst long, weight double")
    for fmt in ("csv", "json", "parquet"):
        p = str(tmp_path / f"el_{fmt}")
        write_edge_list(edges, p, fmt=fmt)
        back = read_edge_list(spark, p, fmt=fmt, weighted=True)
        got = {(r["src"], r["dst"]): r["weight"] for r in back.collect()}
        assert got == {(0, 1): 2.0, (1, 2): 0.5, (2, 0): 1.0}, fmt


def test_edge_list_tsv_comments_and_malformed(spark, tmp_path):
    from neo4j_graph_algorithms_spark.sources.edgelist import read_edge_list

    p = tmp_path / "snap.tsv"
    p.write_text("# SNAP-style header\n0\t1\n1\t2\nbad\tline\n2\t0\n")
    df = read_edge_list(spark, str(p), fmt="csv", delimiter="\t")
    assert {(r["src"], r["dst"]) for r in df.collect()} == \
        {(0, 1), (1, 2), (2, 0)}
