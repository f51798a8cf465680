"""Benchmark decontamination: flag training documents whose word
n-gram overlap with an evaluation/benchmark set exceeds a threshold —
the standard pretraining-corpus hygiene pass (n-gram collision
decontamination à la GPT-3 appendix C / the Pile).

The 100-TB shape: the benchmark side is model-sized (thousands of eval
documents, not terabytes), so its distinct shingle set is BROADCAST and
the corpus is only ever streamed — per doc, one distinct-shingle
projection, one broadcast-hash membership probe, one groupBy(doc_id)
aggregation (partial/map-side combined). Exactly one shuffle of
doc-sized aggregates; never a corpus×benchmark join.

Reference parity: the reference has no decontamination surface (its
similarity family stops at scored pairs, algo/similarity/*); this is a
training-data-pipeline extension alongside dedup.py, in the same
word-shingle vocabulary (dedup.shingles_expr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.pipeline.dedup import shingles_expr

__all__ = ["benchmark_sample", "ngram_decontaminate"]


def benchmark_sample(docs: DataFrame, *, k: int = 20,
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in benchmark: the ``k`` documents with the
    smallest ``md5(id)`` (ties to the smaller id) — the same md5-order
    sampling rule the kmeans/ivf inits use, so the DuckDB oracle
    replays it verbatim. orderBy+limit plans as TakeOrderedAndProject
    (per-partition top-k, k rows merged on the driver)."""
    return (
        docs.withColumn("_m", F.md5(F.col(id_col).cast("string")))
        .orderBy(F.asc("_m"), F.asc(id_col))
        .limit(k)
        .drop("_m")
    )


def ngram_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    *,
    n: int = 3,
    eval_k: int = 20,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram overlap against the benchmark set.

    For every NON-benchmark document: ``n_shingles`` = its distinct
    word n-grams, ``n_hit`` = how many of those also occur anywhere in
    the benchmark set, ``overlap_frac`` = hit ratio (0.0 for docs too
    short to shingle), ``contaminated`` = overlap_frac >= threshold.
    Returns (doc_id, n_shingles, n_hit, overlap_frac, contaminated).

    ``eval_docs`` defaults to :func:`benchmark_sample`(docs, k=eval_k);
    pass a real benchmark table in production. The eval side is always
    reduced to a distinct-shingle set and broadcast.
    """
    if eval_docs is None:
        eval_docs = benchmark_sample(docs, k=eval_k, id_col=id_col)
    ev_ids = eval_docs.select(F.col(id_col).alias("_eid")).distinct()

    def _doc_shingles(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingles_expr(F.col(text_col), n)).alias("sh"),
        ).distinct()

    ev_sh = (
        _doc_shingles(eval_docs).select("sh").distinct()
        .withColumn("_hit", F.lit(1))
    )
    rest = docs.join(
        ev_ids, docs[id_col] == ev_ids["_eid"], "left_anti"
    )
    scored = (
        _doc_shingles(rest)
        .join(F.broadcast(ev_sh), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
    )
    # docs with < n tokens produce no shingle rows: restore them with 0s
    base = rest.select(F.col(id_col).alias("doc_id"))
    out = (
        base.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.round(
                    F.col("n_hit").cast("double") / F.col("n_shingles"), 6
                ),
            ).otherwise(F.lit(0.0)).alias("overlap_frac"),
        )
        .withColumn(
            "contaminated", (F.col("overlap_frac") >= F.lit(threshold))
        )
    )
    return out
