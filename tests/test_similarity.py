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


def test_resource_allocation_and_same_community(spark):
    from neo4j_graph_algorithms_spark.operators.linkprediction import (
        same_community_for_pairs,
    )

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 0)], "src long, dst long"
    )
    pairs = spark.createDataFrame([(1, 2), (0, 3)], "u long, v long")
    got = {(r["u"], r["v"]): r for r in
           link_prediction_for_pairs(edges, pairs).collect()}
    # resourceAllocation(1,2) = 1/deg(0) = 1/3 (LinkPrediction.java:57-75)
    assert got[(1, 2)]["resource_allocation"] == pytest.approx(1 / 3)
    assert got[(0, 3)]["resource_allocation"] == 0.0
    comms = spark.createDataFrame([(0, 7), (1, 7), (2, 9)],
                                  "id long, community long")
    sc = {(r["u"], r["v"]): r["same_community"] for r in
          same_community_for_pairs(pairs, comms).collect()}
    assert sc[(1, 2)] == 0.0          # 7 != 9
    # node 3 lacks the property -> 0.0 (LinkPrediction.java:126-128)
    assert sc[(0, 3)] == 0.0
    sc2 = {(r["u"], r["v"]): r["same_community"] for r in
           same_community_for_pairs(
               spark.createDataFrame([(0, 1)], "u long, v long"), comms
           ).collect()}
    assert sc2[(0, 1)] == 1.0


def test_as_vector_aggregation(spark):
    from neo4j_graph_algorithms_spark.operators.similarity import as_vector

    df = spark.createDataFrame(
        [(1, 10, 0.5), (1, 3, 0.1), (2, 5, 0.9)],
        "id long, item long, weight double")
    got = {r["id"]: r["vector"] for r in as_vector(df, "id").collect()}
    assert [(s["item"], s["weight"]) for s in got[1]] == [(3, 0.1), (10, 0.5)]
    assert [(s["item"], s["weight"]) for s in got[2]] == [(5, 0.9)]


def test_similarity_relationship_sink_roundtrip(spark, tmp_path):
    from neo4j_graph_algorithms_spark.sources.iceberg import (
        read_table,
        write_similarity_relationships,
    )

    pairs = spark.createDataFrame(
        [(0, 1, 0.9), (1, 2, 0.4)], "item1 long, item2 long, similarity double")
    path = str(tmp_path / "similar")
    write_similarity_relationships(pairs, path)
    back = read_table(spark, path)
    rows = {(r["src"], r["dst"]): (r["rel_type"], r["similarity"])
            for r in back.collect()}
    assert rows == {(0, 1): ("SIMILAR", 0.9), (1, 2): ("SIMILAR", 0.4)}


def test_jaccard_hot_category_prune(spark):
    from neo4j_graph_algorithms_spark.operators.similarity import (
        jaccard_categories,
    )

    rows = [(i, ["hub", f"own{i}"]) for i in range(20)]
    items = spark.createDataFrame(rows, "item long, categories array<string>")
    exact = jaccard_categories(items)          # 'hub' links every pair
    assert exact.count() == 190
    pruned = jaccard_categories(items, max_category_df=5)
    assert pruned.count() == 0                  # hub dropped, no overlap left
