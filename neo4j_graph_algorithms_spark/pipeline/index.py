"""Corpus indexing: vocabulary construction, TF-IDF term scoring, and
inverted-index building — the retrieval/tokenizer-training side of a
web-text pipeline (the reference is a graph library; these are engine
extensions in its pipeline mandate, like dedup/sampling).

100-TB shapes:

- **Vocabulary**: the token-count aggregation is one hash shuffle with
  map-side combine (output is vocabulary-sized, not corpus-sized). The
  rank-assignment window is global, which would serialize — so when
  ``max_size`` is set, a count-of-counts HISTOGRAM (model-sized: one
  row per distinct frequency) is aggregated first, the driver derives
  the count threshold that admits ≈max_size tokens, and only the
  surviving ≤O(max_size) rows enter the global window. An unbounded
  build (max_size=None) keeps the global window and is documented as
  the small-vocab path.
- **TF-IDF**: tf = one (doc, term) aggregation; df = one term
  aggregation OF THE TF TABLE (never re-scans the corpus); N is a
  driver scalar. The top-k window partitions by doc — per-doc state,
  fully parallel.
- **Inverted index**: postings are capped BEFORE collecting — a
  doc-id-ordered rank window per term keeps only ``max_postings``
  entries, so a stopword's posting array is bounded; ``df`` still
  reports the true document frequency from the pre-cap aggregation.

Cross-engine determinism: ranks order by (count DESC, token ASC) — a
total order; TF-IDF scores are rounded to 9 dp in BOTH engines before
the (score DESC, term ASC) ordering, so a ≤1-ulp ``ln`` difference
between libm implementations cannot flip a rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from neo4j_graph_algorithms_spark.pipeline.dedup import tokens_expr

__all__ = ["build_vocab", "tfidf_top_terms", "inverted_index",
           "cooccurrence_pmi"]


def _token_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokens_expr(F.col(text_col))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("count"))
    )


def build_vocab(
    docs: DataFrame,
    *,
    min_count: int = 1,
    max_size: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(token, count, token_id): token_id = dense rank 0.. by
    (count DESC, token ASC) — the id layout tokenizer training wants
    (frequent tokens get small ids).

    With ``max_size``, tokens below the histogram-derived count
    threshold never reach the ranking window (see module docstring);
    ties AT the threshold are resolved by the same total order, so the
    result is exactly the top ``max_size``.
    """
    counts = _token_counts(docs, text_col)
    if min_count > 1:
        counts = counts.filter(F.col("count") >= min_count)
    if max_size is not None:
        # model-sized histogram: one row per distinct count value
        hist = sorted(
            ((int(r["count"]), int(r["n"])) for r in
             counts.groupBy("count").agg(F.count(F.lit(1)).alias("n"))
             .collect()),
            reverse=True,
        )
        admitted, threshold = 0, None
        for c, n in hist:
            admitted += n
            threshold = c
            if admitted >= max_size:
                break
        if threshold is not None:
            counts = counts.filter(F.col("count") >= threshold)
    w = W.orderBy(F.col("count").desc(), F.col("token").asc())
    out = counts.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("long"))
    if max_size is not None:
        out = out.filter(F.col("token_id") < max_size)
    return out


def tfidf_top_terms(
    docs: DataFrame,
    *,
    k: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, df, score): each document's top-``k`` terms
    by ``tf · ln(N/df)`` (ties: higher score first, then term ASC).

    ``df`` is computed from the tf table (one vocabulary-sized
    aggregation), joined back on the term key; N is a driver scalar.
    Scores are rounded to 9 dp BEFORE ranking (cross-engine total
    order, see module docstring) and exposed rounded to 6.
    """
    n_docs = docs.count()
    tf = (
        docs.select(
            "doc_id", F.explode(tokens_expr(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").select(
        "doc_id", "term", "tf", "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 9
        ).alias("_s"),
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("_s").desc(), F.col("term").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("doc_id", "term", "tf", "df",
                F.round("_s", 6).alias("score"))
    )


def inverted_index(
    docs: DataFrame,
    *,
    max_postings: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """(token, df, postings): sorted doc-id posting arrays, capped at
    ``max_postings`` ids per token (smallest doc ids kept); ``df`` is
    the TRUE document frequency before the cap.

    The cap applies via a per-token rank window BEFORE any array is
    materialized, so a stopword appearing in 10^10 documents still
    builds a bounded array; the heavy lifting is two term-keyed
    shuffles (distinct + window) with per-token parallel state.
    """
    td = (
        docs.select(
            "doc_id", F.explode(tokens_expr(F.col(text_col))).alias("token"))
        .distinct()
    )
    dfreq = td.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("token").orderBy(F.col("doc_id").asc())
    capped = (
        td.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_postings)
    )
    postings = capped.groupBy("token").agg(
        F.sort_array(F.collect_list("doc_id")).alias("postings"))
    return dfreq.join(postings, "token").select("token", "df", "postings")


def cooccurrence_pmi(
    docs: DataFrame,
    *,
    window: int = 3,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(term_a, term_b, n_pair, pmi): pointwise mutual information of
    unordered token pairs co-occurring within ``window`` positions —
    the skip-gram statistics word-embedding training consumes.

    Definitions (kept deliberately explicit so the oracle can replay
    them): a pair instance is every (i, j) with ``0 < j−i ≤ window``,
    keyed by the lexicographically ordered token pair; with N_p total
    pair instances and N_t total tokens,
    ``pmi = ln( (n_pair/N_p) / ((c_a/N_t)·(c_b/N_t)) )``.
    Pairs with ``n_pair < min_count`` are dropped; same-token pairs
    (a == b) are kept — their PMI measures burstiness.

    100-TB shape: pair instances are generated IN-ROW with nested
    higher-order array expressions (transform over positions ×
    transform over the next ``window`` offsets, flattened) — no
    positional explode + self-join, which at corpus scale would shuffle
    |tokens|·window rows through a doc-keyed join. After the in-row
    expansion the only shuffles are the two count aggregations (pair-
    keyed and token-keyed, both with map-side combine) and a
    vocabulary-sized join of unigram counts back onto pairs.
    """
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    pair = lambda i, j: F.struct(  # noqa: E731 — ordered pair struct
        F.least(F.element_at(toks, i), F.element_at(toks, j)).alias("a"),
        F.greatest(F.element_at(toks, i), F.element_at(toks, j)).alias("b"),
    )
    pairs_expr = F.when(n >= 2, F.flatten(F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.transform(
            F.sequence(i + 1, F.least(i + window, n)),
            lambda j: pair(i, j),
        ),
    ))).otherwise(F.array().cast("array<struct<a:string,b:string>>"))

    pi = docs.select(F.explode(pairs_expr).alias("p")) \
        .select("p.a", "p.b")
    pair_counts = pi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_pair"))
    uni = docs.select(F.explode(toks).alias("t")) \
        .groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    totals = pair_counts.agg(F.sum("n_pair")).first()[0] or 0
    n_tokens = uni.agg(F.sum("c")).first()[0] or 0
    if totals == 0:
        return docs.sparkSession.createDataFrame(
            [], "term_a string, term_b string, n_pair long, pmi double")
    scored = (
        pair_counts.filter(F.col("n_pair") >= min_count)
        .join(uni.withColumnRenamed("t", "a").withColumnRenamed("c", "_ca"),
              "a")
        .join(uni.withColumnRenamed("t", "b").withColumnRenamed("c", "_cb"),
              "b")
        .select(
            F.col("a").alias("term_a"),
            F.col("b").alias("term_b"),
            "n_pair",
            F.log(
                (F.col("n_pair") / F.lit(float(totals)))
                / ((F.col("_ca") / F.lit(float(n_tokens)))
                   * (F.col("_cb") / F.lit(float(n_tokens))))
            ).alias("pmi"),
        )
    )
    return scored
