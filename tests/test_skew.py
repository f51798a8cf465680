"""plans.skew unit tests: salted aggregation equivalence and hub-split
replica assignment invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_edges
from neo4j_graph_algorithms_spark.plans.skew import (
    salted_sum_by_key,
    split_high_degree,
)


def test_salted_sum_equals_plain_groupby(spark):
    rows = [(i % 7, float(i)) for i in range(500)] + [(3, 0.5)] * 100
    df = spark.createDataFrame(rows, "k long, v double")
    plain = {r["k"]: r["v"] for r in
             df.groupBy("k").agg(F.sum("v").alias("v")).collect()}
    for salt in (1, 4, 16):
        salted = {r["k"]: r["v"] for r in
                  salted_sum_by_key(df, "k", "v", salt=salt).collect()}
        assert set(salted) == set(plain)
        for k in plain:
            assert salted[k] == pytest.approx(plain[k], rel=1e-12), (salt, k)


def test_split_high_degree_invariants(spark):
    pairs = [(0, d) for d in range(1, 40)] + [(1, 2), (1, 3), (2, 3)]
    e = make_edges(spark, pairs).select("src", "dst")
    out = split_high_degree(e, threshold=5, replicas=4)
    rows = out.collect()
    # row-preserving: every input edge appears exactly once
    assert sorted((r["src"], r["dst"]) for r in rows) == sorted(pairs)
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], set()).add(r["replica"])
    # hot source spreads over >1 replica; all replicas in range
    assert len(by_src[0]) > 1
    assert all(0 <= rep < 4 for reps in by_src.values() for rep in reps)
    # cold sources stay on replica 0
    assert by_src[1] == {0} and by_src[2] == {0}
