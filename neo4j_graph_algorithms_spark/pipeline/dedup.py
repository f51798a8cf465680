"""Document deduplication: exact, MinHash+LSH, SimHash, token-Jaccard.

Scale notes (the point of each design):

- exact: one hash-aggregate on md5(text) — never materializes pairs.
- MinHash+LSH: per-doc signature (4 md5-derived min-hashes), banded
  (2 bands × 2 rows); candidate pairs appear only through equality
  self-joins on band keys — the all-pairs space is never generated.
- SimHash: 16-bit sign fingerprint from md5-derived token hashes; docs
  sharing a fingerprint are near-dup candidates via one group-by.
- token-Jaccard: inverted-index join on shared tokens prunes to pairs
  with ≥1 common token, then exact Jaccard filters.

All hashes derive from ``md5`` so the DuckDB oracle reproduces them
bit-for-bit (portable across engines, unlike murmur/xxhash builtins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "tokens_expr",
    "exact_duplicates",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "token_jaccard_pairs",
]

N_MINHASH = 4
SIMHASH_BITS = 16


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (the one canonical
    tokenizer shared with the oracles — keep in sync with oracles.py)."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def _h15(col: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5 → bigint
    (DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(fingerprint, n_docs, min_doc_id) — one row per distinct text."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


def _doc_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(tokens_expr(F.col(text_col))).alias("tok")
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, h0..h{n-1}) — min over tokens of salted md5 hashes."""
    toks = _doc_tokens(docs, text_col)
    aggs = [
        F.min(_h15(F.concat(F.col("tok"), F.lit(f"|{k}")))).alias(f"h{k}")
        for k in range(n_hashes)
    ]
    return toks.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Near-dup candidate pairs (doc_a < doc_b) sharing an LSH band
    (band1 = (h0,h1), band2 = (h2,h3))."""
    sigs = minhash_signatures(docs, text_col).persist()
    out = None
    for band in (("h0", "h1"), ("h2", "h3")):
        a = sigs.select(F.col("doc_id").alias("doc_a"), *band)
        b = sigs.select(F.col("doc_id").alias("doc_b"), *band)
        cand = a.join(b, list(band)).filter(F.col("doc_a") < F.col("doc_b")).select(
            "doc_a", "doc_b"
        )
        out = cand if out is None else out.union(cand)
    return out.dropDuplicates(["doc_a", "doc_b"])


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       n_bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — sign-aggregated token-hash fingerprint."""
    toks = _doc_tokens(docs, text_col).withColumn("h", _h15(F.col("tok")))
    aggs = []
    for j in range(n_bits):
        bit = F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))
        aggs.append(
            F.sum(F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))).alias(f"b{j}")
        )
    sums = toks.groupBy("doc_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for j in range(n_bits):
        sig = sig + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sums.select("doc_id", sig.alias("simhash"))


def token_jaccard_pairs(docs: DataFrame, *, threshold: float = 0.8,
                        text_col: str = "text") -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with token-set Jaccard ≥
    threshold — inverted-index join, no all-pairs blowup."""
    toks = _doc_tokens(docs, text_col).distinct()
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    b = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= float(threshold))
    )
