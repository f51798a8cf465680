"""OPIC — On-line Page Importance Computation (crawl prioritization).

Abiteboul, Preda & Cobena, "Adaptive On-Line Page Importance
Computation" (WWW 2003): the importance metric crawl schedulers use to
decide WHICH page to fetch next without waiting for a full PageRank to
converge. Every page holds ``cash``; when crawled it banks its cash
into ``history`` and distributes it equally to its out-neighbours;
importance is estimated from banked history + cash on hand. Unlike
PageRank, partial sums are meaningful at every step — the frontier can
be reprioritized continuously.

This module implements the *synchronous batch* variant (every page
"crawled" each superstep — the standard cluster formulation, e.g. the
one shipped in Apache Nutch's OPIC scoring plugin):

- ``H_{t+1}[i] = H_t[i] + C_t[i]``
- ``C_{t+1}[i] = Σ_{j→i} C_t[j] / outdeg(j)  +  D_t / n``

where ``D_t`` is the total cash sitting on dangling (outdeg-0) pages —
the paper's *virtual page* that links to and from everything, crawled
every round, which keeps the cash system conservative (Σ C ≡ 1) on a
non-strongly-connected web graph. After ``K`` supersteps
``Σ H = K`` exactly, so the importance estimate

    X[i] = (H_K[i] + C_K[i]) / (K + 1)

is a probability vector (sums to 1).

Relation to the reference: the reference engine has no OPIC procedure —
this extends its link-analysis family (algo.pageRank,
PageRankProc.java:56) with the crawl-ordering metric the same host
graphs are built for; it rides the identical superstep discipline as
:mod:`.pagerank` (pre-partitioned, pre-sorted cached edge side; only
the vertex-sized (cash, hist) state moves; dangling mass as an in-plan
1-row broadcast aggregate — pagerank.py:507-513).

100-TB shape: one sort-merge join edges⋈cash per superstep where the
|E|-sized side streams from cache with no exchange/re-sort, one
map-side-combining aggregation on dst, one scalar cross-join. State is
2 doubles per vertex. Fixed ``supersteps`` keeps it SQL-replayable —
the driver oracle unrolls the recurrence verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.plans.loop_conf import superstep_conf

__all__ = ["opic_importance"]


def opic_importance(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    supersteps: int = 10,
    unroll: int = 4,
    return_state: bool = False,
) -> DataFrame:
    """Batch-synchronous OPIC over ``edges (src, dst)``.

    Returns ``(id, importance)`` with Σ importance = 1; with
    ``return_state=True`` also keeps the raw ``cash`` and ``hist``
    columns (what an incremental crawler would persist between
    scheduling rounds).
    """
    if supersteps < 1:
        raise ValueError("supersteps must be >= 1")
    spark = vertices.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    n_vertices = vertices.count()
    if n_vertices == 0:
        return vertices.select(
            "id", F.lit(0.0).alias("importance"))

    # factor(u→v) = 1/outdeg(u); cached sorted-on-src once, like the
    # PageRank loop's static join side (pagerank.py:243-254).
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    fac = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("_d")).alias("factor"))
        .repartition(n_part, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    # dangling = vertices with no outgoing edge (the virtual-page feed)
    dang = vertices.join(
        edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).select("id").persist()

    state = vertices.select(
        "id",
        F.lit(1.0 / float(n_vertices)).alias("cash"),
        F.lit(0.0).alias("hist"),
    ).repartition(n_part, "id").persist()
    state.count()  # materialize the init before the loop

    with superstep_conf(spark):
        prev = state
        for t in range(1, supersteps + 1):
            # D_t as an in-plan scalar: 1-row aggregate, broadcast
            s_row = (
                state.join(dang, "id", "leftsemi")
                .agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("_dm"))
            )
            msgs = (
                fac.join(
                    state.select(F.col("id").alias("src"), "cash"), "src")
                .groupBy("dst")
                .agg(F.sum(F.col("cash") * F.col("factor")).alias("_msg"))
            )
            nxt = (
                state.join(msgs, state["id"] == msgs["dst"], "left")
                .crossJoin(F.broadcast(s_row))
                .select(
                    state["id"],
                    (F.coalesce(F.col("_msg"), F.lit(0.0))
                     + F.col("_dm") / F.lit(float(n_vertices)))
                    .alias("cash"),
                    (F.col("hist") + F.col("cash")).alias("hist"),
                )
            )
            if t % unroll == 0 or t == supersteps:
                nxt = nxt.localCheckpoint(eager=True)
                prev.unpersist()
                prev = nxt
            state = nxt

    fac.unpersist()
    dang.unpersist()
    out = state.select(
        "id",
        ((F.col("hist") + F.col("cash")) / F.lit(float(supersteps + 1)))
        .alias("importance"),
        "cash", "hist",
    )
    if return_state:
        return out
    return out.select("id", "importance")
