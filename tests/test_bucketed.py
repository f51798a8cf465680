"""Bucketed edge-table contract (sources/bucketed.py): the stored
layout replaces the per-run repartition+sort — src-keyed aggregations
and joins over the table plan with NO Exchange on the edge side, and
pagerank(edges_prelayout=True) reproduces the default path's ranks."""

import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.sources.bucketed import (
    read_edges_bucketed,
    write_edges_bucketed,
)


def _explain(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


@pytest.fixture()
def bucketed_edges(spark):
    tmp = tempfile.mkdtemp(prefix="nga_bucketed_")
    name = "t_edges_bucketed_test"
    edges = spark.createDataFrame(
        [(i % 60, (i * 13 + 1) % 60) for i in range(400)],
        "src long, dst long",
    ).dropDuplicates(["src", "dst"])
    write_edges_bucketed(edges, name, n_buckets=4, path=f"{tmp}/edges")
    yield name, edges
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_scan_aggregates_without_exchange(spark, bucketed_edges):
    name, _ = bucketed_edges
    df = read_edges_bucketed(spark, name)
    plan = _explain(df.groupBy("src").count())
    # bucket layout satisfies the aggregation's distribution requirement
    assert "Exchange" not in plan, plan


def test_bucketed_edge_factors_without_shuffle(spark, bucketed_edges):
    from neo4j_graph_algorithms_spark.operators.pagerank import _edge_factors

    name, _ = bucketed_edges
    df = read_edges_bucketed(spark, name)
    plan = _explain(_edge_factors(df, weighted=False))
    # degree groupBy rides the buckets and the degree table broadcasts
    # back onto the scan: a BroadcastExchange of the vertex-sized side
    # is fine, a shuffle of the |E| side is not
    assert "Exchange hashpartitioning" not in plan, plan


def test_prelayout_superstep_join_no_exchange_no_sort(spark, bucketed_edges):
    """The whole point of the storage layout: the per-superstep SMJ
    consumes the cached edge side with NO Exchange and NO Sort — same
    contract as test_plan_shape.test_superstep_join_streams_cached_edges
    but with the layout coming from the bucketed table instead of a
    per-run repartition+sort."""
    import re

    from neo4j_graph_algorithms_spark.operators.pagerank import _edge_factors
    from neo4j_graph_algorithms_spark.plans.loop_conf import superstep_conf

    name, _ = bucketed_edges
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    spark.conf.set(auto_key, "false")
    try:
        ef = (_edge_factors(read_edges_bucketed(spark, name), weighted=False)
              .sortWithinPartitions("src").persist())
        ef.count()
    finally:
        spark.conf.set(auto_key, "true")
    ranks = spark.createDataFrame(
        [(i, 0.15) for i in range(60)], "id long, rank double"
    ).localCheckpoint(eager=True)
    with superstep_conf(spark, 50_000_000):
        msgs = (
            ef.join(ranks.select(F.col("id").alias("src"), "rank"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("factor")).alias("msg"))
        )
        plan = _explain(msgs)
    assert "SortMergeJoin" in plan, plan
    # left (cached-edge) branch: join node down to the InMemoryTableScan
    lines, active, branch = plan.splitlines(), False, []
    for ln in lines:
        if "SortMergeJoin" in ln:
            active = True
            continue
        if active:
            if not ln.lstrip().startswith(":"):
                break
            branch.append(ln)
            if "InMemoryTableScan" in ln:
                break
    assert any("InMemoryTableScan" in ln for ln in branch), plan
    for ln in branch:
        assert "Exchange" not in ln, plan
        assert not re.search(r"\bSort\b", ln), plan
    ef.unpersist()


def test_wcc_prelayout_matches_default(spark):
    from neo4j_graph_algorithms_spark.operators.wcc import connected_components

    tmp = tempfile.mkdtemp(prefix="nga_bucketed_sym_")
    name = "t_edges_bucketed_sym_test"
    # two chains + a singleton: components {0..9}, {20..24}, {40}
    rows = ([(i, i + 1) for i in range(9)]
            + [(i, i + 1) for i in range(20, 24)])
    edges = spark.createDataFrame(rows, "src long, dst long")
    vertices = spark.createDataFrame(
        [(i,) for i in list(range(10)) + list(range(20, 25)) + [40]],
        "id long")
    try:
        write_edges_bucketed(edges, name, n_buckets=4,
                             path=f"{tmp}/edges", symmetrize=True)
        base = connected_components(vertices, edges)
        pre = connected_components(
            vertices, read_edges_bucketed(spark, name), edges_prelayout=True)
        a = {r["id"]: r["component"] for r in base.components.collect()}
        b = {r["id"]: r["component"] for r in pre.components.collect()}
        assert a == b
        assert b[9] == 0 and b[24] == 20 and b[40] == 40
        assert pre.converged
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(tmp, ignore_errors=True)


def test_labelprop_prelayout_matches_default(spark):
    from neo4j_graph_algorithms_spark.operators.labelprop import (
        label_propagation,
    )

    tmp = tempfile.mkdtemp(prefix="nga_bucketed_lp_")
    rows = [(i % 60, (i * 13 + 1) % 60) for i in range(400)]
    edges = spark.createDataFrame(
        rows, "src long, dst long").dropDuplicates(["src", "dst"])
    vertices = spark.createDataFrame([(i,) for i in range(60)], "id long")
    t_dst, t_sym = "t_lp_bucketed_dst", "t_lp_bucketed_sym"
    try:
        # direction='out' gathers on dst → table bucketed on dst
        write_edges_bucketed(edges, t_dst, n_buckets=4, key="dst",
                             path=f"{tmp}/dst")
        base = label_propagation(vertices, edges, max_iterations=5)
        pre = label_propagation(
            vertices, read_edges_bucketed(spark, t_dst),
            max_iterations=5, edges_prelayout=True)
        a = {r["id"]: r["label"] for r in base.labels.collect()}
        b = {r["id"]: r["label"] for r in pre.labels.collect()}
        assert a == b

        # undirected: symmetrized src-bucketed table + direction='in'
        # == default direction='both' on the raw edges
        write_edges_bucketed(edges, t_sym, n_buckets=4, key="src",
                             path=f"{tmp}/sym", symmetrize=True)
        base_u = label_propagation(vertices, edges, max_iterations=5,
                                   direction="both")
        pre_u = label_propagation(
            vertices, read_edges_bucketed(spark, t_sym),
            max_iterations=5, direction="in", edges_prelayout=True)
        au = {r["id"]: r["label"] for r in base_u.labels.collect()}
        bu = {r["id"]: r["label"] for r in pre_u.labels.collect()}
        assert au == bu

        with pytest.raises(ValueError, match="symmetrize"):
            label_propagation(
                vertices, read_edges_bucketed(spark, t_sym),
                direction="both", edges_prelayout=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_dst}")
        spark.sql(f"DROP TABLE IF EXISTS {t_sym}")
        shutil.rmtree(tmp, ignore_errors=True)


def test_pagerank_prelayout_matches_default(spark, bucketed_edges):
    from neo4j_graph_algorithms_spark.operators.pagerank import pagerank

    name, edges = bucketed_edges
    vertices = spark.createDataFrame(
        [(i,) for i in range(60)], "id long")
    base = pagerank(vertices, edges, max_iterations=8)
    pre = pagerank(vertices, read_edges_bucketed(spark, name),
                   max_iterations=8, edges_prelayout=True)
    a = {r["id"]: r["rank"] for r in base.ranks.collect()}
    b = {r["id"]: r["rank"] for r in pre.ranks.collect()}
    assert a.keys() == b.keys()
    assert all(math.isclose(a[k], b[k], rel_tol=1e-12) for k in a)


def test_bucketed_registry_antijoin_state_side_no_exchange(spark):
    """The streaming-dedup scale claim (streaming/dedup.py): a
    fingerprint-bucketed registry anti-joins each micro-batch with NO
    exchange of the registry (big) side — only the batch side is
    repartitioned to the bucket layout. Auto-broadcast is disabled to
    force the at-scale plan (in production the registry is the big
    side and never broadcasts)."""
    import tempfile as _tf
    import shutil as _sh

    tmp = _tf.mkdtemp(prefix="nga_bucketed_reg_")
    name = "t_registry_bucketed_test"
    reg = spark.createDataFrame(
        [(f"fp{i:04d}", i) for i in range(300)],
        "fingerprint string, survivor_doc_id long")
    write_edges_bucketed(reg, name, n_buckets=4, key="fingerprint",
                         path=f"{tmp}/reg")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        state = read_edges_bucketed(spark, name)
        batch = spark.createDataFrame(
            [(f"fp{i:04d}", 1000 + i) for i in range(50)],
            "fingerprint string, survivor_doc_id long")
        fresh = batch.join(state.select("fingerprint"),
                           "fingerprint", "left_anti")
        plan = fresh._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        # exactly ONE exchange: the batch side adopting the bucket
        # partitioning; the state FileScan rides its buckets bare
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # every Exchange line sits on the LEFT (batch) branch — tree
        # lines of the SMJ's left child are ':'-prefixed
        for ln in plan.splitlines():
            if "Exchange" in ln:
                assert ln.lstrip().startswith(":"), plan
        assert "SelectedBucketsCount" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        _sh.rmtree(tmp, ignore_errors=True)
