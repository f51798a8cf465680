"""Byte-pair-encoding merge training over a document corpus.

``pipeline/text.py:bpe_token_stats`` tokenizes with a FIXED GPT-style
regex; real pipelines train the merge table first (Sennrich et al.
ACL 2016). This module is that training step, distributed:

1. ONE corpus pass builds the word-frequency table (the only
   corpus-sized operation — a hash aggregation with map-side combine);
2. every merge round then runs on the VOCABULARY table (distinct words
   as symbol arrays × frequency) — at web scale the vocab is millions
   of rows where the corpus is trillions, which is exactly why
   classical BPE trainers count over the vocab, not the corpus;
3. per round: pair counts (in-row adjacent-pair expansion, weighted by
   word frequency, map-side combine), argmax pair with a total-order
   tie-break (count DESC, left ASC, right ASC — deterministic,
   SQL-replayable), then the merge applied to every spelling.

Merge application is the textbook LEFT-TO-RIGHT NON-OVERLAPPING scan,
expressed as a codegen'd ``aggregate`` fold over the symbol array:
append the symbol, or replace the accumulator's tail with the merged
symbol when (tail, symbol) equals the round's pair. The fold cannot
re-merge its own output within a round because ``merged = left+right ≠
left`` (right is non-empty) — so no skip flag is needed; a run
``[a,a,a]`` merging ``(a,a)`` yields ``[aa,a]`` exactly like the
reference procedure. (A string-``replace`` formulation was measured
WRONG here: the scan resumes after the replacement and the shared
delimiter of adjacent occurrences makes ``[a×6]`` come out
``[aa,a,aa,a]`` instead of ``[aa,aa,aa]`` — hence the array fold.)

The DuckDB oracle (__spark_entry__._bpe_train_sql) restates the same
scan NON-sequentially: candidate positions where the pair occurs,
gaps-and-islands run grouping, select even ranks within each run
(greedy non-overlap selects run positions 0,2,4,…), rebuild skipping
the position after each selected one. Two independent formulations of
one semantics — the point of the oracle.

Driver state per round is ONE collected row (the argmax pair) — the
same model-sized-driver-loop precedent as ``pipeline/kmeans.py``'s
centroids; everything else stays distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = ["bpe_train", "bpe_encode", "spell_expr", "END_OF_WORD"]

END_OF_WORD = "</w>"


def spell_expr(word: Column) -> Column:
    """``cat`` → ``[c, a, t, </w>]`` — the initial symbol array."""
    chars = F.filter(F.split(word, ""), lambda x: x != "")
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _pairs(syms: Column) -> Column:
    """Adjacent symbol pairs, in-row."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at(syms, i + 1).alias("left"),
                F.element_at(syms, i + 2).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<left:string,right:string>>"))


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping merge of (left, right) — the
    textbook BPE sweep as an array fold. Safe without a skip flag:
    the merged tail ``left+right`` can never equal ``left`` again."""
    merged = left + right
    empty = F.array().cast("array<string>")
    return F.aggregate(
        syms,
        empty,
        lambda out, x: F.when(
            (F.size(out) > 0)
            & (F.element_at(out, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(out, 1, F.size(out) - 1),
                     F.array(F.lit(merged))),
        ).otherwise(F.concat(out, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    *,
    n_merges: int = 10,
    text_col: str = "text",
    spark: SparkSession | None = None,
) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the merge table
    ``(merge_rank, left, right, merged, pair_count)`` — rank 1 is the
    most frequent pair of the initial character spelling, rank k the
    argmax after applying merges 1..k−1. ``pair_count`` is the
    corpus-weighted occurrence count that won the round.

    Training stops early when no adjacent pair remains (degenerate
    corpora); the returned table then has fewer than ``n_merges`` rows.
    Words are whitespace-split; a literal ``|`` is stripped (it is the
    oracle's delimiter and never a real token byte in this corpus).
    """
    spark = spark or docs.sparkSession
    words = (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+"))
                    .alias("word"))
        .where(F.col("word") != "")
        .select(F.replace(F.col("word"), F.lit("|"), F.lit(""))
                .alias("word"))
        .where(F.col("word") != "")
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = words.select(spell_expr(F.col("word")).alias("syms"), "freq")
    vocab = vocab.localCheckpoint(eager=True)

    merges = []
    for rank in range(1, n_merges + 1):
        top = (
            vocab.select(F.explode(_pairs(F.col("syms"))).alias("p"),
                         "freq")
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        t = top[0]
        merges.append((rank, t.left, t.right, t.left + t.right,
                       int(t.pair_count)))
        vocab = vocab.select(
            _apply_merge(F.col("syms"), t.left, t.right).alias("syms"),
            "freq",
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges,
        "merge_rank int, left string, right string, merged string, "
        "pair_count long",
    )


def bpe_encode(
    docs: DataFrame,
    merges,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained merge table and count tokens per document:
    ``(doc_id, n_words, n_tokens)``. ``merges`` is :func:`bpe_train`'s
    DataFrame (applied in ``merge_rank`` order) or a list of
    ``(left, right)`` pairs.

    Same vocab trick as training: the merge folds run on the DISTINCT
    word table (each merge is a chained codegen'd array fold — N plan-
    constant rewrites, no shuffle), then ONE word-keyed join carries
    per-word token counts back to the corpus and a doc-keyed
    aggregation sums them. Documents with no words keep a row with
    zero counts.
    """
    if isinstance(merges, DataFrame):
        pairs = [(r.left, r.right) for r in
                 merges.orderBy("merge_rank").collect()]
    else:
        pairs = list(merges)
    doc_words = (
        docs.select("doc_id",
                    F.explode(F.split(F.col(text_col), r"\s+"))
                    .alias("word"))
        .where(F.col("word") != "")
        .select("doc_id",
                F.replace(F.col("word"), F.lit("|"), F.lit(""))
                .alias("word"))
        .where(F.col("word") != "")
    )
    syms = spell_expr(F.col("word"))
    for left, right in pairs:
        syms = _apply_merge(syms, left, right)
    vocab = (
        doc_words.select("word").distinct()
        .select("word", F.size(syms).alias("_ntok"))
    )
    per_doc = (
        doc_words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_words"),
             F.sum("_ntok").alias("n_tokens"))
    )
    return (
        docs.select("doc_id").join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).cast("long")
            .alias("n_tokens"),
        )
    )
