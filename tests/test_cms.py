"""Count-Min Sketch tables (pipeline/cms.py)."""

import hashlib

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.pipeline.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _idx(v: str, d: int, width: int) -> int:
    return _h8(f"{v}#cms{d}") % width


def _vals(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v string")


def test_build_matches_python_replay(spark):
    values = ["a", "b", "a", "c", "a", "b"]
    depth, width = 3, 16
    got = {(r.d, r.idx): r.cnt
           for r in cms_build(_vals(spark, values), "v", depth=depth,
                              width=width).collect()}
    exp = {}
    for v in values:
        for d in range(depth):
            k = (d, _idx(v, d, width))
            exp[k] = exp.get(k, 0) + 1
    assert got == exp


def test_estimate_never_underestimates_and_exact_when_wide(spark):
    values = [c * (i % 5 + 1) for i, c in enumerate("abcdefgh" * 25)]
    truth = {}
    for v in values:
        truth[v] = truth.get(v, 0) + 1
    cms = cms_build(_vals(spark, values), "v")
    items = _vals(spark, sorted(truth))
    est = {r.v: r.est_cnt
           for r in cms_estimate(cms, items, "v").collect()}
    for v, t in truth.items():
        assert est[v] >= t
    # width 1024 over ~40 distinct values: collisions across ALL 4
    # rows simultaneously are absent -> estimates exact
    assert est == truth


def test_merge_is_exact_monoid(spark):
    a = ["x", "y", "x", "z"]
    b = ["y", "y", "w"]
    whole = cms_build(_vals(spark, a + b), "v", depth=2, width=8)
    merged = cms_merge(cms_build(_vals(spark, a), "v", depth=2, width=8),
                       cms_build(_vals(spark, b), "v", depth=2, width=8))
    assert sorted(map(tuple, whole.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_weight_col(spark):
    df = spark.createDataFrame([("a", 5), ("b", 3), ("a", 2)],
                               "v string, n int")
    cms = cms_build(df, "v", depth=2, width=8, weight_col="n")
    est = {r.v: r.est_cnt
           for r in cms_estimate(cms, _vals(spark, ["a", "b"]),
                                 "v", depth=2, width=8).collect()}
    assert est["a"] >= 7 and est["b"] >= 3


def test_absent_item_estimates_zero_on_empty_rows(spark):
    cms = cms_build(_vals(spark, ["only"]), "v", depth=2, width=1024)
    est = {r.v: r.est_cnt
           for r in cms_estimate(cms, _vals(spark, ["missing"]),
                                 "v", depth=2, width=1024).collect()}
    assert est["missing"] == 0
