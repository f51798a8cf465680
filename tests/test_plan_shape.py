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


def test_walk_step_join_is_rank_equi_join(spark):
    """random_walks' per-step edge join must be an equi-join on
    (node, _rk) — the pick rank is computed BEFORE touching the edge
    table, so a walker on a degree-10^6 hub matches one edge row
    instead of fanning out the whole adjacency and filtering."""
    from pyspark.sql import Window as W

    from neo4j_graph_algorithms_spark.operators.traversal import _walk_step

    edges = spark.createDataFrame(
        [(i % 20, (i * 3) % 20) for i in range(60)], "src long, dst long"
    ).dropDuplicates()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg")) \
        .withColumnRenamed("src", "node")
    ranked = edges.select(F.col("src").alias("node"), "dst").withColumn(
        "_rk", F.row_number().over(W.partitionBy("node").orderBy("dst")) - 1)
    cur = spark.createDataFrame(
        [(i, 0, i) for i in range(20)], "walk_id long, step int, node long")
    plan = _explain(_walk_step(cur, deg, ranked, 1, 42))
    # the edge-table join carries BOTH keys (node AND the rank)
    assert re.search(r"keys \[2\]: \[node#\d+L?, _rk#\d+", plan), plan
    # and no residual _rk equality filter above a single-key join (the
    # old fan-out shape computed the pick AFTER joining all edges)
    assert not re.search(r"keys \[1\]: \[node#\d+L?\]\s*$.*_rk = ",
                         plan, re.S), plan


def test_weighted_walk_step_is_packed_equi_join(spark):
    """random_walks_weighted's step join must hit the PACKED adjacency
    (one array row per node) on the single key ``node`` and resolve
    the interval pick in-row — no per-candidate-edge fan-out rows, no
    Window, no post-join interval range filter (the r3 shape joined
    every adjacency row then filtered _cum ranges: a degree-10^6 hub
    walker materialized 10^6 rows per step)."""
    from neo4j_graph_algorithms_spark.operators.traversal import (
        _pack_weighted_adjacency,
        _weighted_walk_step,
    )

    wedges = spark.createDataFrame(
        [(i % 20, (i * 3) % 20, 1 + i % 4) for i in range(60)],
        "src long, dst long, _w long").dropDuplicates(["src", "dst"])
    packed = _pack_weighted_adjacency(wedges)
    cur = spark.createDataFrame(
        [(i, 0, i) for i in range(20)], "walk_id long, step int, node long")
    step = _weighted_walk_step(cur, packed, 1, 42)
    plan = _explain(step)
    assert re.search(r"keys \[1\]: \[node#\d+", plan), plan
    assert "Window" not in plan, plan
    # the pick resolves via in-row array ops on the packed columns
    assert "element_at" in plan and "_cums" in plan, plan
    # and one row per walker comes out (every walker has out-edges here)
    assert step.count() == 20


def test_node2vec_step_is_packed_equi_join(spark):
    """node2vec's second-order step: two vertex-keyed equi-joins
    (current node + prev node packed rows), bias/cum/pick in-row —
    no Window over per-candidate rows (the r3 shape), one row per
    surviving walker."""
    from neo4j_graph_algorithms_spark.operators.traversal import (
        _node2vec_step,
    )

    e = spark.createDataFrame(
        [(i % 20, (i * 3) % 20) for i in range(60)],
        "src long, dst long").dropDuplicates()
    packed = e.groupBy(F.col("src").alias("node")).agg(
        F.sort_array(F.collect_list("dst")).alias("_dsts"))
    cur = spark.createDataFrame(
        [(i, 1, i, (i + 1) % 20) for i in range(20)],
        "walk_id long, step int, node long, prev long")
    step = _node2vec_step(cur, packed, 2, 42, 2.0, 0.5)
    plan = _explain(step)
    assert "Window" not in plan, plan
    assert re.search(r"keys \[1\]: \[node#\d+", plan), plan
    assert re.search(r"keys \[1\]: \[prev#\d+", plan), plan
    assert step.count() == 20


def test_hub_split_expansion_broadcasts_not_shuffles(spark):
    """The hub-split superstep (pagerank hub_threshold path): hot-vertex
    rank rows expand to replicas via a BROADCAST join, and the big edge
    join is keyed (src, replica) so a hub's edges spread over replica
    partitions."""
    from neo4j_graph_algorithms_spark.plans.loop_conf import superstep_conf
    from neo4j_graph_algorithms_spark.plans.skew import split_high_degree

    hub = [(0, d, 1.0 / 200) for d in range(1, 201)]
    cold = [(s, (s + 1) % 50, 1.0) for s in range(1, 50)]
    ef = spark.createDataFrame(hub + cold, "src long, dst long, factor double")
    ef = split_high_degree(ef, threshold=10, replicas=4)
    plan_side = (
        ef.repartition(4, "src", "replica")
        .sortWithinPartitions("src", "replica").persist()
    )
    plan_side.count()
    hot_replica_map = (
        ef.filter(F.col("replica") > 0).select("src").distinct()
        .select(F.col("src"),
                F.explode(F.sequence(F.lit(0), F.lit(3))).alias("replica"))
    )
    ranks = spark.createDataFrame(
        [(i, 0.15) for i in range(201)], "id long, rank double"
    ).localCheckpoint(eager=True)
    with superstep_conf(spark, 50_000_000):
        rank_side = (
            ranks.select(F.col("id").alias("src"), "rank")
            .join(F.broadcast(hot_replica_map), "src", "left")
            .withColumn("replica", F.coalesce("replica", F.lit(0)))
        )
        msgs = (
            plan_side.join(rank_side, ["src", "replica"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("factor")).alias("msg"))
        )
        plan = _explain(msgs)
    assert "BroadcastHashJoin" in plan, plan  # replica expansion
    assert re.search(r"keys \[2\]: \[src#\d+L?, replica#\d+", plan), plan
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


def test_hyperball_gather_streams_cached_pairs(spark):
    """HyperBall's per-radius gather join must stream the cached
    u-partitioned, u-sorted edge side with no Exchange/Sort — only the
    vertex-sized register table moves per round (the same superstep
    contract as PageRank, operators/hyperball.py)."""
    from neo4j_graph_algorithms_spark.plans.loop_conf import superstep_conf

    m = 16
    pairs = spark.createDataFrame(
        [(i % 40, (i * 7) % 40) for i in range(120)], "v long, u long"
    ).repartition(4, "u").sortWithinPartitions("u").persist()
    pairs.count()
    regs = spark.createDataFrame(
        [tuple([i] + [j % 5 for j in range(m)]) for i in range(40)],
        "id long, " + ", ".join(f"r{j} int" for j in range(m)),
    ).localCheckpoint(eager=True)
    with superstep_conf(spark, 50_000_000):
        nbr = regs.select(
            F.col("id").alias("u"),
            *[F.col(f"r{j}").alias(f"n{j}") for j in range(m)])
        gath = (
            pairs.join(nbr, "u")
            .groupBy("v")
            .agg(*[F.max(f"n{j}").alias(f"m{j}") for j in range(m)])
        )
        plan = _explain(gath)
    assert "SortMergeJoin" in plan, plan
    branch = _left_branch_lines(plan)
    assert any("InMemoryTableScan" in ln for ln in branch), plan
    for ln in branch:
        assert "Exchange" not in ln, plan
        assert not re.search(r"\bSort\b", ln), plan
    pairs.unpersist()


def test_filtering_ops_are_single_map_stage(spark):
    """pii_scrub / c4_quality_filter / repetition_scores: pure column
    pipelines — the physical plan must contain NO Exchange (shuffle),
    no Window, no Python eval; one whole-stage-codegen map over the
    scan."""
    from neo4j_graph_algorithms_spark.pipeline.filtering import (
        c4_quality_filter, pii_scrub,
    )
    from neo4j_graph_algorithms_spark.pipeline.text import repetition_scores

    docs = spark.createDataFrame(
        [(i, f"word{i} a b", "en", "s", 10) for i in range(50)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    for out in (pii_scrub(docs),
                c4_quality_filter(docs, blocklist=("a",)),
                repetition_scores(docs)):
        plan = _explain(out)
        assert "Exchange" not in plan, plan
        assert "Window" not in plan, plan
        for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
            assert bad not in plan, plan


def test_mix_corpus_broadcasts_k_table(spark):
    """mix_corpus: the per-stratum k table joins map-side (broadcast);
    the only Exchange is the stratum-key shuffle feeding the window."""
    from neo4j_graph_algorithms_spark.pipeline.sampling import mix_corpus

    docs = spark.createDataFrame(
        [(i, f"t{i}", "en", f"src{i % 3}", 2) for i in range(60)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = mix_corpus(docs, {"src0": 0.5, "src1": 0.5}, by="source")
    plan = _explain(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_pair_expansion_is_in_row_not_self_join(spark):
    """cooccurrence_pmi / walk_skipgram_pairs: the pair expansion must
    stay in-row — the plan up to the pair-count aggregation contains
    Generate (explode) but NO join operator (the oracle's positional
    self-join is exactly what these operators avoid at scale)."""
    from neo4j_graph_algorithms_spark.operators.traversal import (
        walk_skipgram_pairs,
    )
    from neo4j_graph_algorithms_spark.pipeline.index import cooccurrence_pmi

    docs = spark.createDataFrame(
        [(i, "a b c a b", "en", "s", 9) for i in range(10)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    plan = _explain(cooccurrence_pmi(docs, window=2, min_count=1))
    # unigram join onto pair counts is expected; count join OPERATOR
    # NODES — "(n) <Kind>Join" in the formatted node list (the detail
    # section repeats each join ~3x) — the ONLY joins allowed are the
    # two vocabulary joins (ca, cb)
    n_joins = len(re.findall(
        r"\(\d+\)\s+\w*(?:Join|CartesianProduct)", plan))
    assert n_joins <= 2, plan
    assert "Generate" in plan, plan

    walks = spark.createDataFrame(
        [(w, s, (w * 3 + s) % 7) for w in range(20) for s in range(4)],
        "walk_id long, step int, node long")
    plan2 = _explain(walk_skipgram_pairs(walks, window=2))
    n_joins2 = len(re.findall(
        r"\(\d+\)\s+\w*(?:Join|CartesianProduct)", plan2))
    assert n_joins2 == 0, plan2
    assert "Generate" in plan2, plan2


def test_lm_scoring_model_joins_broadcast(spark):
    """ngram_lm_score: both model-sized joins (context counts, n-gram
    counts) must be broadcast-hash — a sort-merge join here would
    shuffle the corpus-sized gram table against a model-sized side."""
    from neo4j_graph_algorithms_spark.pipeline.text import ngram_lm_score

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in
         range(8)],
        "doc_id long, text string")
    plan = _explain(ngram_lm_score(docs))
    n_bc = len(re.findall(r"\(\d+\)\s+BroadcastHashJoin", plan))
    assert n_bc == 2, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_ranked_prefix_sums_no_single_partition_window(spark):
    """The sweep-cut ranking contract (plans/ranking.py): the global
    rank/cumsum must come from range-repartitioned per-partition
    windows — a partition-less Window would collapse the vertex-scale
    table into ONE task (Exchange SinglePartition)."""
    from neo4j_graph_algorithms_spark.plans.ranking import (
        ranked_prefix_sums,
    )

    df = spark.createDataFrame(
        [(i, float((i * 13) % 97), 1) for i in range(300)],
        "id long, key double, w long")
    # inspect the pre-materialization plan: build the same local stage
    # the helper runs before its localCheckpoint
    local = (
        df.repartitionByRange(5, F.asc("key"), F.asc("id"))
        .sortWithinPartitions(F.asc("key"), F.asc("id"))
        .withColumn("_pid", F.spark_partition_id())
    )
    from pyspark.sql import Window
    w = (Window.partitionBy("_pid").orderBy(F.asc("key"), F.asc("id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    staged = local.withColumn("_lrn", F.count(F.lit(1)).over(w))
    plan = _explain(staged)
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan.lower(), plan
    # and the public helper's OUTPUT must already be materialized
    # (localCheckpoint) with correct global ranks
    out = ranked_prefix_sums(df, [F.asc("key"), F.asc("id")],
                             {"w": "cw"}, num_partitions=5)
    out_plan = _explain(out)
    assert "SinglePartition" not in out_plan, out_plan
