"""Similarity search over an embedding column (array<float>).

- :func:`cosine_knn_bruteforce` — exact top-k by cosine: the baseline.
  The query side is broadcast; the dot product is a JVM higher-order
  ``zip_with``/``aggregate`` fold in float64 (no Python, no shuffle of
  the corpus side beyond the scan).
- :func:`sign_lsh_buckets` — seeded random-hyperplane sign LSH
  (Charikar's SimHash for vectors): bucket bit j = sign of the
  projection onto hyperplane r_j drawn from a seeded standard normal.
  (Sign-of-first-n-dims bucketing — the obvious shortcut — gives
  heavily skewed buckets on correlated embedding dimensions; random
  projections decorrelate them.) The scale path: ANN candidates come
  from equality joins on the bucket id; a 100 TB corpus shuffles once
  by bucket instead of cross-joining.
- :func:`cosine_knn_lsh` — bucketed ANN: exact rerank within buckets.

The projections are JVM-side ``zip_with``/``aggregate`` folds against
literal hyperplane arrays — deterministic per seed, no Python in the
hot path, reproducible bit-for-bit by the DuckDB oracle (same literal
constants, same left-to-right summation order).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = ["cosine_knn_bruteforce", "sign_lsh_buckets", "cosine_knn_lsh",
           "embedding_near_dup", "ivf_knn", "hyperplanes"]


def hyperplanes(n_bits: int, dim: int, seed: int) -> np.ndarray:
    """The (n_bits × dim) seeded hyperplane matrix — shared with the
    oracle generator so both engines embed identical constants."""
    return np.random.RandomState(seed).standard_normal((n_bits, dim))


def _embedding_dim(emb: DataFrame, vec_col: str) -> int | None:
    """Vector dimensionality from the first non-null row; None when the
    input is empty or its first vector is null (callers return empty)."""
    row = emb.filter(F.col(vec_col).isNotNull()) \
        .select(F.size(F.col(vec_col)).alias("d")).first()
    return None if row is None or row["d"] is None else int(row["d"])


def _bucket_expr(vec: Column, n_bits: int, dim: int, seed: int) -> Column:
    planes = hyperplanes(n_bits, dim, seed)
    v = _as_double(vec)
    bucket = F.lit(0).cast("long")
    for j in range(n_bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        proj = F.aggregate(F.zip_with(v, plane, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_knn_bruteforce(emb: DataFrame, *, n_queries: int, k: int,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Exact kNN: queries = ids < n_queries vs the whole corpus.

    Output (query_id, neighbor_id, rank, sim) with rank 1..k by
    (sim desc, neighbor_id asc).
    """
    base = emb.select(F.col(id_col).alias("id"),
                      _as_double(F.col(vec_col)).alias("v"))
    base = base.withColumn("n", _norm(F.col("v")))
    q = base.filter(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"),
        F.col("n").alias("qn"))
    pairs = base.join(F.broadcast(q), F.col("id") != F.col("query_id"))
    sims = pairs.select(
        "query_id", F.col("id").alias("neighbor_id"),
        (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n"))).alias("_s"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("_s", 5).alias("sim"))
    )


def sign_lsh_buckets(emb: DataFrame, *, n_bits: int = 8, seed: int = 42,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(bucket, n_vecs, min_vec_id) — seeded random-hyperplane sign
    bucketing (bit j = sign of projection onto hyperplane j)."""
    dim = _embedding_dim(emb, vec_col)
    if dim is None:
        return emb.sparkSession.createDataFrame(
            [], "bucket long, n_vecs long, min_vec_id long")
    bucket = _bucket_expr(F.col(vec_col), n_bits, dim, seed)
    return (
        emb.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


def embedding_near_dup(emb: DataFrame, *, threshold: float = 0.9,
                       n_bits: int = 8, seed: int = 42,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    The 100 TB dedup shape: candidates come from an equality self-join
    on the random-hyperplane sign bucket (one shuffle by bucket — never
    all-pairs), then the exact cosine filter keeps pairs with
    sim >= threshold. Output (vec_a, vec_b, sim) with vec_a < vec_b,
    sim rounded to 5 dp. Recall is governed by n_bits (fewer bits →
    bigger buckets → higher recall, more candidates); production would
    OR several bucket tables like MinHash bands.
    """
    dim = _embedding_dim(emb, vec_col)
    if dim is None:
        return emb.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, sim double")
    bucket = _bucket_expr(F.col(vec_col), n_bits, dim, seed)
    base = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"),
        bucket.alias("bucket"),
    ).withColumn("n", _norm(F.col("v")))
    a = base.select("bucket", F.col("id").alias("vec_a"),
                    F.col("v").alias("av"), F.col("n").alias("an"))
    b = base.select("bucket", F.col("id").alias("vec_b"),
                    F.col("v").alias("bv"), F.col("n").alias("bn"))
    cand = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    sims = cand.select(
        "vec_a", "vec_b",
        (_dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))).alias("_s"),
    )
    return (
        sims.filter(F.col("_s") >= threshold)
        .select("vec_a", "vec_b", F.round("_s", 5).alias("sim"))
    )


def cosine_knn_lsh(emb: DataFrame, *, k: int, n_bits: int = 8,
                   seed: int = 42, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Approximate kNN: candidates share a random-hyperplane sign-LSH
    bucket; exact cosine rerank within each bucket (one shuffle by
    bucket, no cross join)."""
    dim = _embedding_dim(emb, vec_col)
    if dim is None:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, sim double")
    bucket = _bucket_expr(F.col(vec_col), n_bits, dim, seed)
    base = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"),
        bucket.alias("bucket"),
    ).withColumn("n", _norm(F.col("v")))
    a = base.select("bucket", F.col("id").alias("query_id"),
                    F.col("v").alias("qv"), F.col("n").alias("qn"))
    b = base.select("bucket", F.col("id").alias("neighbor_id"),
                    F.col("v").alias("nv"), F.col("n").alias("nn"))
    cand = a.join(b, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    sims = cand.select(
        "query_id", "neighbor_id",
        (_dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))).alias("_s"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("_s", 5).alias("sim"))
    )


def ivf_knn(emb: DataFrame, *, n_queries: int, k: int,
            n_centroids: int = 16, n_probe: int = 4,
            refine_iterations: int = 0,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style approximate kNN (inverted-file coarse quantizer).

    Coarse quantize the corpus into ``n_centroids`` cells — centroids
    are a deterministic md5-ordered pseudo-random sample of the corpus
    itself (oracle-replicable; a production run would plug in sampled
    k-means centroids, the cell machinery is identical) — assign every
    vector to its nearest centroid with a NARROW per-row argmax fold
    over a broadcast centroid-array column (no shuffle, no corpus ×
    n_centroids blowup), then each query (ids < n_queries) searches
    only its ``n_probe`` nearest cells.

    The 100 TB shape: centroid sampling is a distributed top-k
    (TakeOrderedAndProject), assignment is a map-only stage, and the
    corpus shuffles exactly once — by cell id into the candidate join —
    where a query reranks only ~n_probe/n_centroids of the data;
    nothing all-pairs. Output (query_id, neighbor_id, rank, sim) like
    ``cosine_knn_bruteforce``; recall < 1 by construction (vectors in
    unprobed cells are unseen). With n_centroids=1 it degenerates to
    the exact brute-force result.

    ``refine_iterations > 0`` is the production quantizer: the md5
    sample seeds :func:`..pipeline.kmeans.kmeans_fit`, whose Lloyd
    rounds (map-only assignment + one model-sized shuffle per round)
    tighten the cells before the probe phase. Cell ids then become
    0..n_centroids-1 (centroid-list positions) instead of corpus ids;
    the output columns and their semantics are unchanged. The driver
    oracle keeps refine_iterations=0 (the sample path) — the refined
    path is covered by pytest equivalence at n_centroids=1.
    """
    base = emb.select(F.col(id_col).alias("id"),
                      _as_double(F.col(vec_col)).alias("v"))
    base = base.withColumn("n", _norm(F.col("v")))
    # deterministic pseudo-random centroid sample: n_centroids smallest
    # md5(id) values. orderBy+limit compiles to TakeOrderedAndProject —
    # a per-partition top-k merged on the driver, never a global sort.
    # The collect is bounded by n_centroids (model-sized, not data-sized).
    cents_rows = (
        base.withColumn("_m", F.md5(F.col("id").cast("string")))
        .orderBy(F.asc("_m"), F.asc("id"))
        .limit(n_centroids)
        .select("id", "v", "n")
        .collect()
    )
    spark = emb.sparkSession
    if refine_iterations > 0:
        from neo4j_graph_algorithms_spark.pipeline.kmeans import kmeans_fit

        res = kmeans_fit(
            emb, k=n_centroids, iterations=refine_iterations,
            id_col=id_col, vec_col=vec_col,
            init_centroids=[[float(x) for x in r["v"]] for r in cents_rows],
        )
        cents = [
            (cid, cv, math.sqrt(sum(x * x for x in cv)) or 1.0)
            for cid, cv in enumerate(res.centroids)
        ]
    else:
        cents = [(int(r["id"]), [float(x) for x in r["v"]], float(r["n"]))
                 for r in cents_rows]
    cdf = spark.createDataFrame(
        [(cents,)],
        "cents array<struct<cid:bigint,cv:array<double>,cn:double>>",
    )
    wc = base.crossJoin(F.broadcast(cdf))  # one row: adds the array col
    # narrow argmax fold — best (cosine desc, cent_id asc), identical
    # comparator to the oracle's row_number(ORDER BY cs DESC, cid ASC)
    init = F.struct(F.lit(float("-inf")).alias("cs"),
                    F.lit(-1).cast("long").alias("cid"))

    def _step(acc: Column, c: Column) -> Column:
        cs = _dot(F.col("v"), c["cv"]) / (F.col("n") * c["cn"])
        better = (cs > acc["cs"]) | ((cs == acc["cs"]) & (c["cid"] < acc["cid"]))
        return F.when(better,
                      F.struct(cs.alias("cs"), c["cid"].alias("cid"))
                      ).otherwise(acc)

    assigned = wc.select(
        F.aggregate("cents", init, _step)["cid"].alias("cell"),
        "id", "v", "n")
    # each query probes its n_probe nearest cells (query side is tiny:
    # n_queries × n_centroids rows through the window)
    qca = (
        base.filter(F.col("id") < n_queries)
        .crossJoin(F.broadcast(cdf))
        .select("id", "v", "n", F.explode("cents").alias("c"))
        .select("id", "v", "n", F.col("c.cid").alias("cent_id"),
                (_dot(F.col("v"), F.col("c.cv"))
                 / (F.col("n") * F.col("c.cn"))).alias("_cs"))
    )
    wa = W.partitionBy("id").orderBy(F.desc("_cs"), F.asc("cent_id"))
    probes = (
        qca.withColumn("_ar", F.row_number().over(wa))
        .filter(F.col("_ar") <= n_probe)
        .select(F.col("cent_id").alias("cell"),
                F.col("id").alias("query_id"), F.col("v").alias("qv"),
                F.col("n").alias("qn"))
    )
    cand = assigned.join(probes, "cell").filter(
        F.col("id") != F.col("query_id"))
    sims = cand.select(
        "query_id", F.col("id").alias("neighbor_id"),
        (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n"))).alias("_s"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("_s", 5).alias("sim"))
    )
