"""Physical-plan regression tests — the scale contract, not just the
results. These pin the plan shapes the engine's performance story
depends on (BASELINE.md §4.3), so a refactor that silently reintroduces
a per-superstep exchange or loses parquet pushdown fails fast:

1. the PageRank/WCC superstep join streams the cached pre-partitioned,
   pre-sorted edge side with NO Exchange and NO Sort above the
   InMemoryTableScan — only the vertex-sized state moves;
2. parquet scans prune columns (ReadSchema) and push filters
   (PushedFilters) down to the reader.
"""

import re

from pyspark.sql import functions as F


def _explain(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def _left_branch_lines(plan: str) -> list[str]:
    """Tree lines of the SMJ's left (edge-cache) branch: from the join
    node down to its InMemoryTableScan leaf (prefixed ':-' / ':')."""
    lines = plan.splitlines()
    out, active = [], False
    for ln in lines:
        if "SortMergeJoin" in ln:
            active = True
            continue
        if active:
            stripped = ln.lstrip()
            if not stripped.startswith(":"):
                break
            out.append(ln)
            if "InMemoryTableScan" in ln:
                break
    return out


def test_superstep_join_streams_cached_edges(spark):
    """The per-superstep message join must not exchange or re-sort the
    |E|-sized cached side (operators/pagerank.py plan_side contract)."""
    from neo4j_graph_algorithms_spark.plans.loop_conf import superstep_conf

    e = spark.createDataFrame(
        [(i % 50, (i * 7) % 50, 1.0 / 3) for i in range(150)],
        "src long, dst long, factor double")
    plan_side = e.repartition(4, "src").sortWithinPartitions("src").persist()
    plan_side.count()
    ranks = spark.createDataFrame(
        [(i, 0.15) for i in range(50)], "id long, rank double"
    ).localCheckpoint(eager=True)
    # large-n conf → no broadcast: the SMJ path the real graph takes
    with superstep_conf(spark, 50_000_000):
        msgs = (
            plan_side.join(
                ranks.select(F.col("id").alias("src"), "rank"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("factor")).alias("msg"))
        )
        plan = _explain(msgs)
    assert "SortMergeJoin" in plan
    branch = _left_branch_lines(plan)
    assert any("InMemoryTableScan" in ln for ln in branch), plan
    # the cached side is consumed as-is: nothing between the join and
    # the cache scan may shuffle or sort (the Sort/Exchange inside the
    # InMemoryRelation's build plan ran once at persist time)
    for ln in branch:
        assert "Exchange" not in ln, plan
        assert not re.search(r"\bSort\b", ln), plan
    plan_side.unpersist()


def test_superstep_join_broadcasts_small_state(spark):
    """With a small vertex count the loop conf permits broadcasting the
    vertex-sized side — neither side shuffles at all."""
    from neo4j_graph_algorithms_spark.plans.loop_conf import superstep_conf

    e = spark.createDataFrame(
        [(i % 50, (i * 7) % 50, 1.0 / 3) for i in range(150)],
        "src long, dst long, factor double")
    plan_side = e.repartition(4, "src").sortWithinPartitions("src").persist()
    plan_side.count()
    ranks = spark.createDataFrame(
        [(i, 0.15) for i in range(50)], "id long, rank double"
    ).localCheckpoint(eager=True)
    with superstep_conf(spark, 50):
        joined = plan_side.join(
            ranks.select(F.col("id").alias("src"), "rank"), "src")
        plan = _explain(joined)
    assert "BroadcastHashJoin" in plan
    plan_side.unpersist()


def test_parquet_column_pruning_and_filter_pushdown(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    proj = li.select("l_orderkey", "l_partkey").filter(
        F.col("l_orderkey") > 100)
    plan = _explain(proj)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_partkey"}, plan
    assert re.search(r"PushedFilters: \[.*GreaterThan\(l_orderkey,100\)",
                     plan), plan


def test_edges_scan_reads_only_two_columns(spark):
    """__spark_entry__._edges must prune lineitem to its 2 used columns
    even though the table has 16."""
    import __spark_entry__ as em

    e = em._edges(spark, "/root/testdata/sf0.001")
    plan = _explain(e)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_partkey"}, plan
