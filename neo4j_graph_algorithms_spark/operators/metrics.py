"""Community-labeling comparison metrics: NMI and Adjusted Rand Index.

The engine ships five community detectors (WCC, label propagation,
Louvain, InfoMap, SCC) plus dedup clusterings; comparing two labelings
is the standard way to evaluate them against each other or against a
ground truth (Vinh, Epps & Bailey, JMLR 2010 for the information-
theoretic family; Hubert & Arabie 1985 for ARI). The reference has no
comparison procedure — this is an engine extension.

Everything reduces to the contingency table: ONE join of the two
labelings on vertex id, one (label_a, label_b)-keyed count aggregation
(map-side combinable — the table is at most |communities_a| ×
|communities_b| rows, model-sized for real clusterings), and marginal
sums. NMI/ARI are then closed-form scalar arithmetic over those
integers, so the DuckDB oracle replays the identical formula from the
identical integer inputs.

Scale note: the combination terms C(x,2) = x(x−1)/2 are computed in
DOUBLE — at 10^12 vertices a marginal's x(x−1) overflows int64, and the
metric is a ratio where the ~1e-16 relative double error is
immaterial. The contingency counts themselves stay exact longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["community_compare", "community_conductance"]


def community_conductance(
    edges: DataFrame,
    labels: DataFrame,
    *,
    label_col: str = "community",
) -> DataFrame:
    """Per-community cut size, volume, and conductance — the standard
    quality score for a partition (Kannan, Vempala & Vetta; used to
    evaluate any of the engine's community detectors).

    ``labels``: (id, community). Degrees/volumes are over the
    undirected simple graph induced by ``edges`` (symmetrized,
    deduplicated, self-loops dropped); ``cut(c)`` counts undirected
    edges with exactly one endpoint labeled ``c``; conductance =
    cut / min(vol, 2m − vol), NULL-free: communities whose denominator
    is 0 (the whole graph) are excluded.

    Shape: one distinct over the edge table, two broadcast-sized joins
    of the edge list against the (vertex-sized) label table, then
    community-keyed aggregations — output is |communities| rows,
    model-sized. No per-prefix or per-pair work.
    """
    lab = labels.select("id", F.col(label_col).alias("_c"))
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .distinct()
        # materialized once; the returned plan still references it, so a
        # persist+unpersist pair would silently recompute it downstream
        .localCheckpoint(eager=True)
    )
    m = und.count()
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    )
    vol = (
        lab.join(deg, "id", "left")
        .groupBy(F.col("_c").alias("community"))
        .agg(F.count(F.lit(1)).alias("size"),
             F.sum(F.coalesce(F.col("deg"), F.lit(0))).alias("vol"))
    )
    la = lab.select(F.col("id").alias("a"), F.col("_c").alias("_ca"))
    lb = lab.select(F.col("id").alias("b"), F.col("_c").alias("_cb"))
    sided = (
        und.join(la, "a").join(lb, "b")
        .withColumn("_x", F.when(F.col("_ca") != F.col("_cb"), 1)
                    .otherwise(0))
    )
    cut = (
        sided.select(F.col("_ca").alias("community"), "_x")
        .unionAll(sided.select(F.col("_cb").alias("community"), "_x"))
        .groupBy("community").agg(F.sum("_x").alias("cut"))
    )
    m2 = 2.0 * m
    den = F.least(F.col("vol").cast("double"), F.lit(m2) - F.col("vol"))
    return (
        vol.join(cut, "community", "left")
        .select(
            "community",
            F.col("size").cast("long").alias("size"),
            F.col("vol").cast("long").alias("vol"),
            F.coalesce(F.col("cut"), F.lit(0)).cast("long").alias("cut"),
            F.when(den > 0,
                   F.round(F.coalesce(F.col("cut"), F.lit(0)) / den, 6)
                   + F.lit(0.0)).alias("conductance"),
        )
    )


def community_compare(
    labels_a: DataFrame,
    labels_b: DataFrame,
    *,
    col_a: str = "label",
    col_b: str = "label",
) -> DataFrame:
    """One row ``(n, nmi, ari)`` comparing two labelings joined on
    ``id`` (inner join — only commonly-labeled vertices count).

    NMI = 2·I(A;B) / (H(A) + H(B)) with natural logs (1.0 for identical
    partitions, 0 when independent; 1.0 by convention when both
    entropies are 0 — the single-cluster vs single-cluster case).
    ARI is Hubert-Arabie adjusted-for-chance Rand (1.0 identical,
    ~0 random, can be negative)."""
    a = labels_a.select("id", F.col(col_a).alias("_ca"))
    b = labels_b.select("id", F.col(col_b).alias("_cb"))
    ct = (
        a.join(b, "id")
        .groupBy("_ca", "_cb")
        .agg(F.count(F.lit(1)).alias("nij"))
        .persist()
    )
    ma = ct.groupBy("_ca").agg(F.sum("nij").alias("ai"))
    mb = ct.groupBy("_cb").agg(F.sum("nij").alias("bj"))

    c2 = lambda x: (F.col(x).cast("double")
                    * (F.col(x).cast("double") - 1.0)) / 2.0  # noqa: E731
    sums = ct.agg(
        F.sum("nij").cast("double").alias("n"),
        F.sum(c2("nij")).alias("sum_nij2"),
    )
    sa = ma.agg(F.sum(c2("ai")).alias("sum_ai2"))
    sb = mb.agg(F.sum(c2("bj")).alias("sum_bj2"))

    # mutual information and entropies from the same contingency table;
    # every ln argument is a ratio of exact integers
    mi = (
        ct.crossJoin(F.broadcast(sums.select("n")))
        .join(F.broadcast(ma), "_ca")
        .join(F.broadcast(mb), "_cb")
        .agg(F.sum(
            (F.col("nij") / F.col("n"))
            * F.log((F.col("n") * F.col("nij"))
                    / (F.col("ai").cast("double") * F.col("bj")))
        ).alias("mi"))
    )
    ha = (ma.crossJoin(F.broadcast(sums.select("n")))
          .agg((-F.sum((F.col("ai") / F.col("n"))
                       * F.log(F.col("ai") / F.col("n")))).alias("ha")))
    hb = (mb.crossJoin(F.broadcast(sums.select("n")))
          .agg((-F.sum((F.col("bj") / F.col("n"))
                       * F.log(F.col("bj") / F.col("n")))).alias("hb")))

    out = (
        sums.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
        .select(
            F.col("n").cast("long").alias("n"),
            F.when(F.col("ha") + F.col("hb") == 0.0, F.lit(1.0))
            .otherwise(2.0 * F.col("mi") / (F.col("ha") + F.col("hb")))
            .alias("nmi"),
            F.when(
                (F.col("sum_ai2") + F.col("sum_bj2")) / 2.0
                - F.col("sum_ai2") * F.col("sum_bj2")
                / (F.col("n") * (F.col("n") - 1.0) / 2.0) == 0.0,
                F.lit(1.0),
            ).otherwise(
                (F.col("sum_nij2")
                 - F.col("sum_ai2") * F.col("sum_bj2")
                 / (F.col("n") * (F.col("n") - 1.0) / 2.0))
                / ((F.col("sum_ai2") + F.col("sum_bj2")) / 2.0
                   - F.col("sum_ai2") * F.col("sum_bj2")
                   / (F.col("n") * (F.col("n") - 1.0) / 2.0))
            ).alias("ari"),
        )
    )
    rows = out.collect()
    ct.unpersist()
    spark = labels_a.sparkSession
    return spark.createDataFrame(rows, "n long, nmi double, ari double")
