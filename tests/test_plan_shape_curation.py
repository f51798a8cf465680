"""Physical-plan regression tests for the round-3 curation operators —
the scale contracts their docstrings claim, pinned so a refactor can't
silently reintroduce a window sort, a Python eval, or an extra shuffle.
Companion to tests/test_plan_shape.py (superstep/pushdown contracts).
"""

from pyspark.sql import functions as F


def _explain(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def _pages(spark, n=200):
    return spark.createDataFrame(
        [(f"https://H{i % 5}.org/p/{i % 40}/?b=2&a=1#f{i}", i, f"t{i}")
         for i in range(n)],
        "url string, capture_ts long, text string")


def test_url_dedup_single_shuffle_no_window(spark):
    """url_dedup's contract: ONE hash aggregation keyed by canonical
    URL (map-side partial combine) — no Window sort, no join, no
    Python anywhere."""
    from neo4j_graph_algorithms_spark.pipeline.urlnorm import url_dedup

    plan = _explain(url_dedup(
        _pages(spark), ts_col="capture_ts"))
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "Join" not in plan
    # exactly one exchange in the plan TREE (the formatted details
    # section repeats node names — count the tree only)
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    # an aggregate BELOW the exchange = map-side partial combine
    below = tree.split("Exchange")[1]
    assert "Aggregate" in below


def test_random_projection_is_map_only(spark):
    """random_project folds the matrix into plan constants: ZERO
    exchanges, zero Python — one projected scan."""
    from neo4j_graph_algorithms_spark.pipeline.projection import (
        random_project,
    )

    emb = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(10)],
        "vec_id long, embedding array<float>")
    plan = _explain(random_project(emb, out_dim=4, seed=1))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_line_dedup_no_window_no_python(spark):
    """line_dedup's winner rule is a min-struct aggregation, NOT a
    row_number window (a global window would single-partition the
    sort); re-assembly is an array_sort inside the doc-keyed agg."""
    from neo4j_graph_algorithms_spark.pipeline.lines import line_dedup

    docs = spark.createDataFrame(
        [(i, f"a{i}\nb{i % 3}") for i in range(20)],
        "doc_id long, text string")
    plan = _explain(line_dedup(docs))
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_boilerplate_site_totals_broadcast(spark):
    """boilerplate_scores joins the model-sized site-totals table by
    broadcast — the corpus-sized line table must never shuffle for it."""
    from neo4j_graph_algorithms_spark.pipeline.lines import (
        boilerplate_scores,
    )

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", f"NAV\nbody {i}") for i in range(30)],
        "doc_id long, source string, text string")
    plan = _explain(boilerplate_scores(docs))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "EvalPython" not in plan


def test_canonicalize_whole_stage_codegen(spark):
    """canonicalize_url stays inside WholeStageCodegen (no codegen
    fallback, no Python) — it is ONE column expression."""
    from neo4j_graph_algorithms_spark.pipeline.urlnorm import (
        canonicalize_url,
    )

    df = spark.range(100).select(
        F.concat(F.lit("https://H.org/p/"), F.col("id"),
                 F.lit("?b=2&a=1")).alias("url"))
    out = df.select(canonicalize_url("url").alias("c"))
    # codegen stage markers ("*(n)") only show in simple mode
    simple = out._jdf.queryExecution().executedPlan().toString()
    assert "*(" in simple
    assert "EvalPython" not in simple
