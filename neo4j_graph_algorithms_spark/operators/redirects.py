"""Redirect-chain resolution by pointer doubling.

Common-Crawl-style corpora carry HTTP/meta redirects: a functional edge
table ``(src, dst)`` mapping a page to the page it forwards to. Before
any link-graph analytics the crawl's URLs must be canonicalized to their
final landing targets — every hop a chain survives inflates PageRank
conduits and splits WCC components. The reference has no such operator
(it consumes an already-materialized Neo4j graph); this is crawl-side
preprocessing the 10^12-document pipeline needs, shipped as a
first-class extension.

Semantics: for every redirect source, follow ``f(src) = dst`` until the
current target is NOT itself a redirect source (resolved), or until
``2**doubling_rounds`` hops have been taken (unresolved — redirect
cycles and over-long chains stay flagged rather than looping forever;
real crawls contain both). Output one row per redirect source:
``(src, final_dst, hops, resolved)``.

Scale shape: pointer doubling — state ``(src, ptr, hops)`` self-joined
``ptr -> src`` per round, so ``k`` rounds resolve chains up to ``2^k``
hops with O(log L) vertex-sized shuffles; never a per-hop walk. A node
whose pointer already left the redirect domain simply misses the join
and carries forward unchanged (the standard parallel list-ranking /
path-halving formulation, same kernel as wcc.py's pointer jumping and
traversal.py's path recovery). For unresolved (cyclic) sources hops
doubles every round, ending at exactly ``2^k`` — which is what a
single-step walk capped at ``2^k`` hops reports too, so the driver
oracle is a plain recursive CTE with a hop cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.loop_conf import superstep_conf

__all__ = ["resolve_redirects"]


def resolve_redirects(
    redirects: DataFrame,
    *,
    doubling_rounds: int = 6,
    spark: SparkSession | None = None,
) -> DataFrame:
    """(src, final_dst, hops, resolved) for every redirect source.

    ``redirects`` must be functional on src; duplicate srcs are
    canonicalized to the smallest dst (deterministic) and self-loops
    dropped. ``resolved`` is 1 when final_dst is not itself a redirect
    source (the chain terminated), 0 when the hop cap ``2**
    doubling_rounds`` was hit (a cycle, or a chain longer than the cap).
    """
    spark = spark or redirects.sparkSession

    f = (
        redirects.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )
    state = f.select(
        "src",
        F.col("dst").alias("ptr"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint(eager=True)
    n = state.count()

    with superstep_conf(spark, n):
        for _ in range(doubling_rounds):
            nxt = state.select(
                F.col("src").alias("_p"),
                F.col("ptr").alias("_pp"),
                F.col("hops").alias("_ph"),
            )
            state = (
                state.join(nxt, state["ptr"] == nxt["_p"], "left")
                .select(
                    "src",
                    F.coalesce(F.col("_pp"), F.col("ptr")).alias("ptr"),
                    (F.col("hops")
                     + F.coalesce(F.col("_ph"), F.lit(0))).alias("hops"),
                )
                .localCheckpoint(eager=True)
            )

    dom = f.select(F.col("src").alias("ptr")).distinct()
    return (
        state.join(dom.withColumn("_in_dom", F.lit(1)), "ptr", "left")
        .select(
            "src",
            F.col("ptr").alias("final_dst"),
            "hops",
            F.when(F.col("_in_dom").isNull(), F.lit(1))
            .otherwise(F.lit(0)).alias("resolved"),
        )
    )
