"""Text analysis over the documents table: token stats, quality
scoring, n-gram-heuristic language ID, document fingerprinting, one-hot
encoding (the reference's algo.ml.oneHotEncoding, ml/OneHotEncoding.java:33,
re-expressed over a lang column).

All JVM-side column expressions; ratios are exact-integer divisions so
the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.pipeline.dedup import (
    shingles_expr, tokens_expr,
)

__all__ = ["token_stats", "bpe_token_stats", "quality_scores",
           "repetition_scores", "ngram_lm_score", "perplexity_buckets",
           "language_id", "fingerprints", "one_hot_lang", "LANGS",
           "STOPWORDS", "LANG_PROFILES", "BPE_PATTERN"]

# GPT-2-style pre-tokenizer shape: letter runs, digit runs, punctuation
# runs, each absorbing one leading space. Restricted to a dialect with
# identical leftmost-first semantics in Java regex (Spark) and RE2
# (DuckDB) so the oracle matches token-for-token.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

LANGS = ["de", "en", "es", "fr", "zh"]

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]

# tiny per-language function-word profiles for the n-gram-free heuristic
LANG_PROFILES = {
    "de": ["der", "die", "und", "ist", "nicht"],
    "en": ["the", "a", "and", "is", "not"],
    "es": ["el", "la", "y", "es", "no"],
    "fr": ["le", "la", "et", "est", "pas"],
    "zh": ["de", "shi", "bu", "le", "wo"],
}


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, avg_token_len)."""
    toks = docs.select("doc_id",
                       F.explode(tokens_expr(F.col(text_col))).alias("tok"))
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
        F.round(F.avg(F.length("tok")), 6).alias("avg_token_len"),
    )


def bpe_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_distinct_bpe) — token
    counting under both units: whitespace words and BPE-ish regex
    pieces (:data:`BPE_PATTERN`).

    Pure per-row column expressions (``regexp_extract_all`` +
    ``size``): NO explode, NO shuffle — the whole operator is one
    narrow map stage, the cheapest possible 100 TB shape."""
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(tokens_expr(F.col(text_col))).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(F.array_distinct(bpe)).alias("n_distinct_bpe"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, stop_ratio, ttr, quality): stopword ratio, type-token
    ratio, and a length/stopword composite — the usual cheap pretraining
    quality heuristics."""
    toks = docs.select("doc_id",
                       F.explode(tokens_expr(F.col(text_col))).alias("tok"))
    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("tok").alias("nd"),
        F.sum(F.when(F.col("tok").isin(STOPWORDS), 1).otherwise(0)).alias("ns"),
    )
    stop_ratio = F.col("ns").cast("double") / F.col("n")
    ttr = F.col("nd").cast("double") / F.col("n")
    length_score = F.least(F.lit(1.0), F.col("n").cast("double") / 200.0)
    return agg.select(
        "doc_id",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(ttr, 6).alias("ttr"),
        F.round(0.4 * stop_ratio + 0.3 * ttr + 0.3 * length_score, 6
                ).alias("quality"),
    )


def repetition_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, top_bigram_frac, dup_bigram_frac, max_token_run) — the
    Gopher/MassiveText-style repetition filters: fraction of bigram
    instances taken by the most frequent bigram, fraction of bigram
    instances whose bigram occurs more than once, and the longest
    consecutive same-token run.

    100-TB shape: every signal is computed INSIDE the row with JVM
    higher-order array functions (``transform``/``filter``/``aggregate``
    over the token array) — NO explode, NO shuffle, a single narrow map
    stage like :func:`bpe_token_stats`. The per-row distinct×instances
    scan is O(d·m) on document-sized arrays, which beats shipping every
    bigram through an exchange at corpus scale.

    Docs with fewer than 2 tokens have no bigrams: both fractions are
    0.0 (and ``max_token_run`` counts tokens, so it is 1 for a 1-token
    doc and 0 for an empty one).
    """
    toks = tokens_expr(F.col(text_col))
    bg = shingles_expr(F.col(text_col), 2)
    # per-distinct-bigram instance counts, computed in-row
    counts = F.transform(
        F.array_distinct(bg),
        lambda x: F.size(F.filter(bg, lambda y: y == x)),
    )
    total = F.size(bg).cast("double")
    top = F.array_max(counts).cast("double")
    dup = F.aggregate(
        counts,
        F.lit(0),
        lambda acc, c: acc + F.when(c > 1, c).otherwise(F.lit(0)),
    ).cast("double")
    # longest same-token run: left fold carrying (prev, run, best)
    run_state = F.aggregate(
        toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return docs.select(
        "doc_id",
        F.when(total > 0, F.round(top / total, 6))
        .otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        F.when(total > 0, F.round(dup / total, 6))
        .otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
        run_state.cast("long").alias("max_token_run"),
    )


def _char_ngrams(text, n: int):
    """Character n-gram array of a string column, all-JVM (every
    contiguous n-char window; strings shorter than n yield none)."""
    m = F.length(text) - (n - 1)
    seq = F.transform(
        F.sequence(F.lit(1), m), lambda i: text.substr(i, F.lit(n)))
    # sequence(1, m) DESCENDS for m < 1 — guard explicitly
    return F.when(m >= 1, seq).otherwise(F.array().cast("array<string>"))


def ngram_lm_score(
    docs: DataFrame,
    *,
    n: int = 3,
    alpha: float = 1.0,
    text_col: str = "text",
    train: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_ngrams, cross_entropy): character n-gram language-model
    quality score — the CCNet/Gopher-style "LM perplexity" filter, with
    an add-α-smoothed conditional model standing in for KenLM (no
    external model files in-sandbox, and the simple model is exactly
    SQL-replayable):

        P(cₙ | c₁..cₙ₋₁) = (count(c₁..cₙ) + α) / (count(c₁..cₙ₋₁·*) + α·V)

    where V = number of distinct observed continuation characters and
    the context count is the sum of its continuations' counts.
    ``cross_entropy`` is −mean ln P per n-gram — LOW = natural text
    under the training distribution, HIGH = gibberish/boilerplate.
    Docs shorter than ``n`` chars have no n-grams and are absent from
    the output (same semantics as :func:`repetition_scores`' empty
    case, but there is no meaningful score to assign here).

    ``train`` scores ``docs`` under a model fitted on a DIFFERENT
    corpus (the CCNet pattern: fit on a trusted reference corpus, score
    the crawl); default fits on ``docs`` itself (self-perplexity).

    100-TB shape: one corpus pass builds the model — a hash aggregation
    with map-side combine whose OUTPUT is model-sized (≤ |alphabet|ⁿ
    rows), never corpus-sized; V is a one-number driver scalar derived
    from the model table. Scoring is explode → TWO BROADCAST hash joins
    (context counts, n-gram counts — both model-sized) → per-doc
    aggregation with map-side combine. No corpus-sized shuffle except
    the doc-keyed score aggregation itself.

    Cross-engine determinism: the per-doc mean of ln-probabilities is
    rounded to 6 dp AFTER the division; summation-order differences
    between engines sit at ~1e-11 relative, far below the rounding.
    """
    src = train if train is not None else docs
    tric = (
        src.select(F.explode(_char_ngrams(F.col(text_col), n)).alias("g"))
        .groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    )
    ctxc = (
        tric.groupBy(F.substring("g", 1, n - 1).alias("ctx"))
        .agg(F.sum("c").alias("cc"))
    )
    # model-sized driver scalar: distinct observed continuation chars
    v = tric.agg(
        F.countDistinct(F.substring("g", n, 1)).alias("v")
    ).collect()[0]["v"]
    scored = (
        docs.select(
            "doc_id",
            F.explode(_char_ngrams(F.col(text_col), n)).alias("g"))
        .withColumn("ctx", F.substring("g", 1, n - 1))
        .join(F.broadcast(ctxc), "ctx", "left")
        .join(F.broadcast(tric), "g", "left")
    )
    lp = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(alpha)))
        / (F.coalesce(F.col("cc"), F.lit(0)) + F.lit(float(alpha * v)))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.round(-F.sum(lp) / F.count(F.lit(1)), 6).alias("cross_entropy"),
    )


def perplexity_buckets(
    docs: DataFrame,
    *,
    lang_col: str = "lang",
    n: int = 3,
    alpha: float = 1.0,
    text_col: str = "text",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    train: DataFrame | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.3):
    per language, documents below the ``cuts[0]`` perplexity quantile
    are ``head`` (the cleanest third — what CCNet ships for LM
    training), below ``cuts[1]`` ``middle``, else ``tail``. Scores come
    from :func:`ngram_lm_score` (pass ``train`` to score the crawl
    under a trusted reference corpus, the real CCNet setup).

    Returns ``(doc_id, lang, cross_entropy, bucket)``.

    100-TB shape: thresholds via an EXACT interpolated percentile
    aggregation per language — output is languages×2 numbers
    (model-sized), then ONE broadcast join labels every document.
    Deliberately NOT ``ntile`` over a per-language window: the 'en'
    partition of a crawl is a third of the corpus and a window would
    sort it on one task. Spark's exact ``percentile`` buffers
    (value → count) pairs, so its state is bounded by DISTINCT score
    values, not rows — and the scores are 6-dp-rounded doubles in a
    few-nats range, capping distinct values in the low millions
    regardless of corpus size. (``approx_percentile`` is rejected on
    determinism grounds: its sketch merge is partition-order-dependent,
    which would break the oracle and idempotent re-runs.) Thresholds
    and scores are both 6-dp-rounded so the bucket comparison is
    integer-exact cross-engine.
    """
    scores = ngram_lm_score(docs, n=n, alpha=alpha, text_col=text_col,
                            train=train)
    sl = (
        docs.select("doc_id", F.col(lang_col).alias("lang"))
        .join(scores.select("doc_id", "cross_entropy"), "doc_id")
    )
    th = sl.groupBy("lang").agg(
        F.round(F.percentile("cross_entropy", F.lit(cuts[0])), 6)
        .alias("_t1"),
        F.round(F.percentile("cross_entropy", F.lit(cuts[1])), 6)
        .alias("_t2"),
    )
    ce = F.col("cross_entropy")
    return sl.join(F.broadcast(th), "lang").select(
        "doc_id", "lang", "cross_entropy",
        F.when(ce <= F.col("_t1"), "head")
        .when(ce <= F.col("_t2"), "middle")
        .otherwise("tail").alias("bucket"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang) — argmax of per-language function-word hit
    counts, deterministic alphabetical tie-break."""
    toks = docs.select("doc_id",
                       F.explode(tokens_expr(F.col(text_col))).alias("tok"))
    aggs = [
        F.sum(F.when(F.col("tok").isin(LANG_PROFILES[lang]), 1).otherwise(0)
              ).alias(f"s_{lang}")
        for lang in LANGS
    ]
    scored = toks.groupBy("doc_id").agg(*aggs)
    # first language (alphabetical) achieving the max
    pred = None
    for lang in LANGS:
        cond = True
        expr = F.col(f"s_{lang}")
        for other in LANGS:
            if other != lang:
                c = expr >= F.col(f"s_{other}")
                cond = c if cond is True else (cond & c)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return scored.select("doc_id", pred.otherwise(F.lit(LANGS[-1])).alias("pred_lang"))


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — bag fingerprint: md5 of the space-joined sorted
    distinct token set (order-insensitive near-exact dup detector)."""
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(
                tokens_expr(F.col(text_col)))))
        ).alias("fp"),
    )


def one_hot_lang(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_de, …, lang_zh) — one-hot over the lang column
    (≡ algo.ml.oneHotEncoding with the LANGS vocabulary)."""
    cols = [
        F.when(F.col("lang") == lang, 1).otherwise(0).alias(f"lang_{lang}")
        for lang in LANGS
    ]
    return docs.select("doc_id", *cols)
