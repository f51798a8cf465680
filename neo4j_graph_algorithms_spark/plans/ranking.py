"""Distributed global ranking and prefix sums.

A plain ``row_number().over(Window.orderBy(...))`` (no partitionBy)
collapses the whole input into ONE task — a non-starter for
vertex-scale tables. This helper computes a global 1-based rank and
running (prefix) sums with the classic two-pass shape instead:

1. ``repartitionByRange`` on the total order (range partitioner — the
   partition index follows the sort order), sort within partitions,
   and compute *partition-local* row numbers / running sums with a
   ``partitionBy(spark_partition_id())`` window — fully parallel;
2. aggregate one row per partition (count + local totals), collect
   those ``num_partitions`` rows to the driver (model-sized, never
   data-sized), turn them into exclusive prefix offsets, and
   broadcast-join the offsets back.

The order must be TOTAL (include a unique tiebreaker column such as
the vertex id): rows with equal keys may straddle a range boundary,
and only a total order makes the assigned ranks well-defined.

Used by the sweep-cut operator (operators/local_cluster.py), where
both the score ordering and the cumulative volume/cut-edge sums run
over the full vertex support.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["ranked_prefix_sums"]


def ranked_prefix_sums(
    df: DataFrame,
    order_by: list[Column],
    sums: dict[str, str] | None = None,
    *,
    rank_col: str = "_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` plus a global 1-based ``rank_col`` under the total
    order ``order_by``, and for each ``sums`` entry ``{src: out}`` a
    running-sum column ``out`` = sum of ``src`` over all rows with rank
    ≤ the row's own (inclusive prefix sum in rank order).

    Two jobs: one to range-partition + locally rank, one tiny
    per-partition aggregate collected to the driver (``num_partitions``
    rows) to build the cross-partition offsets.
    """
    sums = sums or {}
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))

    local = (
        df.repartitionByRange(n, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid").orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = local.withColumn("_lrn", F.count(F.lit(1)).over(w))
    for src, out in sums.items():
        local = local.withColumn(f"_l_{out}", F.sum(F.col(src)).over(w))
    local = local.persist()

    # one row per (non-empty) partition → driver → exclusive offsets
    aggs = [F.count(F.lit(1)).alias("_cnt")] + [
        F.sum(F.col(src)).alias(f"_t_{out}") for src, out in sums.items()
    ]
    totals = sorted(
        local.groupBy("_pid").agg(*aggs).collect(), key=lambda r: r["_pid"]
    )
    offsets, run_cnt = [], 0
    run_sum = {out: 0 for out in sums.values()}
    for r in totals:
        offsets.append(
            (r["_pid"], run_cnt, *[float(run_sum[o]) for o in sums.values()]))
        run_cnt += r["_cnt"]
        for (src, out) in sums.items():
            run_sum[out] += r[f"_t_{out}"] or 0
    off_schema = ", ".join(
        ["_pid int", "_off_cnt long"]
        + [f"_off_{out} double" for out in sums.values()]
    )
    off = spark.createDataFrame(offsets, off_schema)

    out_df = local.join(F.broadcast(off), "_pid")
    out_df = out_df.withColumn(
        rank_col, (F.col("_lrn") + F.col("_off_cnt")).cast("long"))
    for src, out in sums.items():
        out_df = out_df.withColumn(out, F.col(f"_l_{out}") + F.col(f"_off_{out}"))
    drop = ["_pid", "_lrn", "_off_cnt"] + [
        c for out in sums.values() for c in (f"_l_{out}", f"_off_{out}")
    ]
    # materialize before unpersisting the intermediate (the result plan
    # references it); localCheckpoint also keeps downstream plans flat
    out_df = out_df.drop(*drop).localCheckpoint(eager=True)
    local.unpersist()
    return out_df
