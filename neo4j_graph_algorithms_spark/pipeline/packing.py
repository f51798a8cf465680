"""Sequence packing: map a token-counted corpus onto fixed-size
training chunks (the GPT-style "concatenate everything, cut every B
tokens" layout).

Given a document order (``doc_id`` ascending — in production the
post-shuffle sample order), every document occupies the half-open
token interval ``[cum_before, cum_before + n_tokens)`` of the global
concatenated stream; chunk ``c`` is tokens ``[c·B, (c+1)·B)``. The
operator emits, per document, where it lands:

``(doc_id, n_tokens, start_chunk, end_chunk, offset_in_chunk)``

100-TB shape — the global running sum is the textbook two-phase scan,
NOT one giant window:

1. range-shard by ``doc_id`` (S contiguous shards, S = shuffle
   parallelism), partial ``sum(n_tokens)`` per shard → S rows to the
   driver (model-sized, like the k-means centroid collect);
2. exclusive prefix offsets per shard are broadcast back as a literal
   S-row map, and the within-shard running sum is a window partitioned
   BY SHARD — every partition sorts only its own slice, so the sort is
   distributed and spill-bounded, never a single-partition global
   window (Spark's ``Window.orderBy`` without ``partitionBy`` collapses
   to one task — the exact anti-pattern this module exists to avoid).

The result is byte-identical to the naive global window (addition is
associative), which is precisely what the DuckDB oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from neo4j_graph_algorithms_spark.pipeline.dedup import tokens_expr

__all__ = ["pack_sequences"]


def pack_sequences(
    docs: DataFrame,
    *,
    budget: int,
    text_col: str = "text",
    n_shards: int | None = None,
) -> DataFrame:
    """Assign every document its chunk span in the packed token stream.

    ``budget`` = tokens per chunk (B). Token counts use the canonical
    whitespace tokenizer. Documents with 0 tokens still get a row
    (empty span: ``end_chunk = start_chunk``, they occupy no tokens).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    spark = docs.sparkSession
    n_shards = n_shards or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))

    counted = docs.select(
        "doc_id",
        F.size(tokens_expr(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    # contiguous range shards: shard s covers doc_id in [s·W, (s+1)·W)
    hi = counted.agg(F.max("doc_id")).first()[0]
    if hi is None:
        return counted.select(
            "doc_id", "n_tokens",
            F.lit(0).cast("long").alias("start_chunk"),
            F.lit(0).cast("long").alias("end_chunk"),
            F.lit(0).cast("long").alias("offset_in_chunk"),
        )
    width = max(1, int(hi) // n_shards + 1)
    sharded = counted.withColumn(
        "_shard", (F.col("doc_id") / F.lit(width)).cast("long"))

    # phase 1: model-sized per-shard totals → exclusive prefix offsets
    totals = {
        int(r["_shard"]): int(r["s"])
        for r in sharded.groupBy("_shard")
        .agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = [], 0
    for s in sorted(totals):
        offsets.append((s, acc))
        acc += totals[s]
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "_shard long, _off long"))

    # phase 2: within-shard running sum (distributed sort), + offset
    w = (
        W.partitionBy("_shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("_off")
    placed = (
        sharded.join(off_df, "_shard")
        .select("doc_id", "n_tokens", cum_before.alias("_cum"))
    )
    b = int(budget)
    # integral DIV, not float division — exact at any stream length
    return placed.select(
        "doc_id",
        "n_tokens",
        F.expr(f"_cum DIV {b}").alias("start_chunk"),
        # last token sits at _cum + n_tokens - 1; empty docs span nothing
        F.when(
            F.col("n_tokens") > 0,
            F.expr(f"(_cum + n_tokens - 1) DIV {b}"),
        ).otherwise(F.expr(f"_cum DIV {b}")).alias("end_chunk"),
        F.expr(f"_cum % {b}").alias("offset_in_chunk"),
    )
