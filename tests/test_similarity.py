"""Similarity + link-prediction operators vs the reference's scalar
semantics (Similarities.java:41-169, LinkPrediction.java:38-122)."""

import math

import pytest

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.similarity import (
    cosine_expr,
    cosine_vectors,
    euclidean_expr,
    jaccard_categories,
    jaccard_expr,
    overlap_expr,
    pearson_expr,
    top_k,
)
from neo4j_graph_algorithms_spark.operators.linkprediction import (
    link_prediction_for_pairs,
)


def test_scalar_functions(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [3.0, 2.0, 1.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        cosine_expr(F.col("a"), F.col("b")).alias("cos"),
        euclidean_expr(F.col("a"), F.col("b")).alias("euc"),
        pearson_expr(F.col("a"), F.col("b")).alias("pea"),
    ).first()
    assert row["cos"] == pytest.approx(10 / 14)
    assert row["euc"] == pytest.approx(math.sqrt(8))
    assert row["pea"] == pytest.approx(-1.0)

    dfc = spark.createDataFrame(
        [([1, 2, 3], [2, 3, 4])], "a array<long>, b array<long>"
    )
    row = dfc.select(
        jaccard_expr(F.col("a"), F.col("b")).alias("j"),
        overlap_expr(F.col("a"), F.col("b")).alias("o"),
    ).first()
    assert row["j"] == pytest.approx(2 / 4)
    assert row["o"] == pytest.approx(2 / 3)


def test_jaccard_categories_matrix(spark):
    items = spark.createDataFrame(
        [(1, [10, 20, 30]), (2, [10, 20, 40]), (3, [50])],
        "item long, categories array<long>",
    )
    got = {(r["item1"], r["item2"]): r["similarity"]
           for r in jaccard_categories(items).collect()}
    assert got[(1, 2)] == pytest.approx(2 / 4)
    assert (1, 3) not in got  # no shared category → never generated


def test_cosine_vectors_topk(spark):
    items = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.1]), (3, [0.0, 1.0])],
        "item long, vector array<double>",
    )
    res = cosine_vectors(items, top_k_per_item=1).collect()
    by1 = [r for r in res if r["item1"] == 1]
    assert len(by1) == 1 and by1[0]["item2"] == 2


def test_top_k_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 5, 0.9), (1, 3, 0.9), (1, 7, 0.5)], "k long, other long, s double"
    )
    got = top_k(df, "k", "s", 2).collect()
    assert sorted(r["other"] for r in got) == [3, 5]


def test_link_prediction(spark):
    # triangle a-b, a-c, b-c plus pendant d-a: score pair (b,c) and (a,d)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 0)], "src long, dst long"
    )
    pairs = spark.createDataFrame([(1, 2), (0, 3)], "u long, v long")
    got = {(r["u"], r["v"]): r for r in
           link_prediction_for_pairs(edges, pairs).collect()}
    r = got[(1, 2)]
    # N(1)={0,2}, N(2)={0,1}; common={0}, deg(0)=3
    assert r["common_neighbors"] == 1
    assert r["adamic_adar"] == pytest.approx(1 / math.log(3))
    assert r["preferential_attachment"] == 4
    assert r["total_neighbors"] == 3
    r = got[(0, 3)]
    assert r["common_neighbors"] == 0
    assert r["adamic_adar"] == 0.0
    assert r["preferential_attachment"] == 3
    assert r["total_neighbors"] == 4
