"""Mergeable HLL sketch tables (pipeline/sketches.py)."""

import numpy as np

from neo4j_graph_algorithms_spark.pipeline.sketches import (
    hll_cardinality,
    hll_group_sketches,
    hll_merge_sketches,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "key string, value string")


def test_estimate_within_hll_error(spark):
    rng = np.random.default_rng(1)
    rows = []
    truth = {}
    for key, n in (("a", 500), ("b", 100), ("c", 10)):
        vals = {f"{key}-v{i}" for i in range(n)}
        truth[key] = len(vals)
        for v in vals:
            for _ in range(int(rng.integers(1, 4))):  # duplicates
                rows.append((key, v))
    b = 6
    sk = hll_group_sketches(_docs(spark, rows), ["key"], "value", b=b)
    est = {r.key: r.distinct_est
           for r in hll_cardinality(sk, ["key"], b=b).collect()}
    rel = 1.04 / np.sqrt(1 << b)          # standard HLL std error
    for k, n in truth.items():
        assert abs(est[k] - n) <= max(4 * rel * n, 6), (k, est[k], n)


def test_merge_equals_union_sketch_exactly(spark):
    rows_a = [("k", f"x{i}") for i in range(200)]
    rows_b = [("k", f"x{i}") for i in range(100, 350)]
    b = 5
    sk_a = hll_group_sketches(_docs(spark, rows_a), ["key"], "value", b=b)
    sk_b = hll_group_sketches(_docs(spark, rows_b), ["key"], "value", b=b)
    merged = sorted(
        hll_merge_sketches(sk_a, sk_b, ["key"], b=b).collect())
    union = sorted(
        hll_group_sketches(_docs(spark, rows_a + rows_b),
                           ["key"], "value", b=b).collect())
    assert merged == union                # register-EXACT


def test_merge_order_independent_and_disjoint_keys(spark):
    rows_a = [("a", f"v{i}") for i in range(50)]
    rows_b = [("b", f"w{i}") for i in range(30)]
    b = 4
    sa = hll_group_sketches(_docs(spark, rows_a), ["key"], "value", b=b)
    sb = hll_group_sketches(_docs(spark, rows_b), ["key"], "value", b=b)
    ab = sorted(hll_merge_sketches(sa, sb, ["key"], b=b).collect())
    ba = sorted(hll_merge_sketches(sb, sa, ["key"], b=b).collect())
    assert ab == ba
    assert {r.key for r in ab} == {"a", "b"}


def test_duplicates_do_not_move_registers(spark):
    b = 4
    once = hll_group_sketches(
        _docs(spark, [("k", "only")]), ["key"], "value", b=b).collect()
    many = hll_group_sketches(
        _docs(spark, [("k", "only")] * 50), ["key"], "value",
        b=b).collect()
    assert sorted(once) == sorted(many)
