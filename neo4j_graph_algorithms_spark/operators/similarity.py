"""Similarity procedures — ``algo.similarity.jaccard/cosine/overlap/...``
(reference: algo/.../similarity/JaccardProc.java:36-89, CosineProc.java,
SimilarityProc.java, TopKConsumer.java).

The reference computes all-pairs similarity over per-item category sets
or weight vectors, with ``similarityCutoff``, ``degreeCutoff``, per-item
``topK`` and global ``topN``. Spark restatement: the all-pairs space is
pruned *before* it exists — category sets meet through an inverted-index
join on shared categories (pairs sharing nothing are never generated),
vectors through a (broadcast) cross join only when explicitly asked.
Top-K is the standard window + ``row_number``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = [
    "jaccard_categories",
    "overlap_categories",
    "cosine_vectors",
    "euclidean_vectors",
    "pearson_vectors",
    "as_vector",
    "top_k",
    "jaccard_expr",
    "cosine_expr",
    "euclidean_expr",
    "pearson_expr",
    "overlap_expr",
]


def jaccard_categories(items: DataFrame, *, cutoff: float = 0.0,
                       degree_cutoff: int = 0,
                       max_category_df: int | None = None) -> DataFrame:
    """All-pairs Jaccard over category sets via inverted-index join.

    ``items``: (item, categories: array). Output (item1 < item2,
    similarity) with ``similarity >= cutoff`` and
    ``|categories| >= degree_cutoff`` (JaccardProc.java:43,56).

    ``max_category_df`` (None = exact, the reference semantics): at
    web scale a category shared by k items contributes k² rows to the
    inverted-index self-join; setting a document-frequency ceiling
    drops such hub categories from BOTH the intersections and the set
    sizes (Jaccard over the pruned sets), the same prune as
    pipeline.dedup.token_jaccard_pairs.
    """
    base = items.select("item", F.explode("categories").alias("cat")).distinct()
    if max_category_df is not None:
        rare = (base.groupBy("cat").agg(F.count(F.lit(1)).alias("_df"))
                .filter(F.col("_df") <= int(max_category_df)).select("cat"))
        base = base.join(rare, "cat", "left_semi")
    sizes = base.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    if degree_cutoff > 0:
        keep = sizes.filter(F.col("n") >= degree_cutoff).select("item")
        base = base.join(keep, "item", "left_semi")
    a = base.select(F.col("item").alias("item1"), "cat")
    b = base.select(F.col("item").alias("item2"), "cat")
    inter = (
        a.join(b, "cat")
        .filter(F.col("item1") < F.col("item2"))
        .groupBy("item1", "item2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sim = (
        inter.join(sizes.withColumnRenamed("item", "item1")
                   .withColumnRenamed("n", "na"), "item1")
        .join(sizes.withColumnRenamed("item", "item2")
              .withColumnRenamed("n", "nb"), "item2")
        .select(
            "item1", "item2",
            (F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
             ).alias("similarity"),
        )
    )
    return sim.filter(F.col("similarity") >= float(cutoff))


def overlap_categories(items: DataFrame, *, cutoff: float = 0.0) -> DataFrame:
    """Overlap coefficient |A∩B| / min(|A|,|B|) (OverlapProc)."""
    base = items.select("item", F.explode("categories").alias("cat")).distinct()
    sizes = base.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    a = base.select(F.col("item").alias("item1"), "cat")
    b = base.select(F.col("item").alias("item2"), "cat")
    inter = (
        a.join(b, "cat")
        .filter(F.col("item1") < F.col("item2"))
        .groupBy("item1", "item2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sim = (
        inter.join(sizes.withColumnRenamed("item", "item1")
                   .withColumnRenamed("n", "na"), "item1")
        .join(sizes.withColumnRenamed("item", "item2")
              .withColumnRenamed("n", "nb"), "item2")
        .select(
            "item1", "item2",
            (F.col("i").cast("double") / F.least("na", "nb")).alias("similarity"),
        )
    )
    return sim.filter(F.col("similarity") >= float(cutoff))


def cosine_vectors(items: DataFrame, *, cutoff: float = 0.0,
                   top_k_per_item: int | None = None) -> DataFrame:
    """All-pairs cosine over weight vectors (CosineProc). ``items``:
    (item, vector: array<double>). Broadcast cross join — intended for
    dimension-table-sized inputs; use pipeline.ann for large N."""
    with_norm = items.select(
        "item", "vector",
        F.sqrt(F.aggregate(
            F.col("vector"), F.lit(0.0), lambda acc, x: acc + x * x
        )).alias("norm"),
    )
    a = with_norm.select(F.col("item").alias("item1"),
                         F.col("vector").alias("va"), F.col("norm").alias("na"))
    b = with_norm.select(F.col("item").alias("item2"),
                         F.col("vector").alias("vb"), F.col("norm").alias("nb"))
    pairs = a.join(F.broadcast(b), F.col("item1") < F.col("item2"))
    sim = pairs.select(
        "item1", "item2",
        (F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                     F.lit(0.0), lambda acc, x: acc + x)
         / (F.col("na") * F.col("nb"))).alias("similarity"),
    ).filter(F.col("similarity") >= float(cutoff))
    if top_k_per_item:
        sim = top_k(sim, "item1", "similarity", top_k_per_item)
    return sim


def _vector_pairs(items: DataFrame) -> DataFrame:
    a = items.select(F.col("item").alias("item1"), F.col("vector").alias("va"))
    b = items.select(F.col("item").alias("item2"), F.col("vector").alias("vb"))
    return a.join(F.broadcast(b), F.col("item1") < F.col("item2"))


def euclidean_vectors(items: DataFrame, *, cutoff: float | None = None,
                      top_k_per_item: int | None = None) -> DataFrame:
    """All-pairs euclidean DISTANCE over weight vectors (EuclideanProc;
    note: cutoff keeps pairs with distance <= cutoff, and topK is
    smallest-distance-first — distance is a dissimilarity)."""
    sim = _vector_pairs(items).select(
        "item1", "item2", euclidean_expr(F.col("va"), F.col("vb")).alias("distance")
    )
    if cutoff is not None:
        sim = sim.filter(F.col("distance") <= float(cutoff))
    if top_k_per_item:
        w = W.partitionBy("item1").orderBy(F.asc("distance"), F.asc("item2"))
        sim = (sim.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") <= top_k_per_item).drop("_rn"))
    return sim


def pearson_vectors(items: DataFrame, *, cutoff: float = -1.0,
                    top_k_per_item: int | None = None) -> DataFrame:
    """All-pairs Pearson correlation over weight vectors (PearsonProc)."""
    sim = _vector_pairs(items).select(
        "item1", "item2", pearson_expr(F.col("va"), F.col("vb")).alias("similarity")
    ).filter(F.col("similarity") >= float(cutoff))
    if top_k_per_item:
        sim = top_k(sim, "item1", "similarity", top_k_per_item)
    return sim


def as_vector(df: DataFrame, group_col: str, item_col: str = "item",
              weight_col: str = "weight") -> DataFrame:
    """``algo.similarity.asVector`` (Similarities.java:75-79,
    SimilarityVectorAggregator): aggregate (item, weight) rows into one
    vector-of-structs per group — the input shape the similarity procs
    consume. Items ordered ascending for determinism.

    Output: (``group_col``, vector array<struct<item, weight>>).
    """
    return (
        df.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(item_col).alias("item"),
                             F.col(weight_col).alias("weight"))
                )
            ).alias("vector")
        )
    )


def top_k(df: DataFrame, key: str, score: str, k: int) -> DataFrame:
    """Per-key top-K (≡ TopKConsumer / SourceTargetTopKTask):
    window + row_number, deterministic tie-break on the other columns."""
    others = [c for c in df.columns if c not in (key, score)]
    w = W.partitionBy(key).orderBy(F.desc(score), *[F.asc(c) for c in others])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# ---- scalar user functions (algo.similarity.* — Similarities.java:41-169)
# expressed as Column expressions over two array columns (JVM higher-order
# functions — no Python UDF).


def jaccard_expr(a, b):
    inter = F.size(F.array_intersect(a, b))
    return inter.cast("double") / (F.size(a) + F.size(b) - inter)


def overlap_expr(a, b):
    return (F.size(F.array_intersect(a, b)).cast("double")
            / F.least(F.size(a), F.size(b)))


def cosine_expr(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def euclidean_expr(a, b):
    return F.sqrt(
        F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, x: acc + x)
    )


def pearson_expr(a, b):
    n = F.size(a).cast("double")
    sa = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)
    sb = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x)
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    qa = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    qb = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x)
    cov = dot - sa * sb / n
    va = qa - sa * sa / n
    vb = qb - sb * sb / n
    return cov / F.sqrt(va * vb)
