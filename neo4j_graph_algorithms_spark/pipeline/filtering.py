"""Document-level curation filters: PII scrubbing and C4-style
quality gating.

Both are map-only column pipelines — every rule is a JVM expression
(``regexp_replace`` / higher-order array functions) over the document
row, so at 100 TB they cost exactly one scan with zero shuffles and
full whole-stage codegen; there is no Python anywhere in the path.

They are engine extensions in the reference's pipeline mandate (the
reference is a graph library with no text surface); the rule sets
mirror the published C4 (Raffel et al. 2020, §2.2) and CCNet-style
cleanup steps that Common-Crawl-derived training corpora apply before
dedup.

Cross-engine determinism: the scrub regexes are restricted to a
dialect (literal classes, bounded repetition, ``\\b`` anchors, greedy
``+``) on which Java regex (Spark) and RE2 (DuckDB) produce identical
matches, so the DuckDB oracle replays the same patterns verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from neo4j_graph_algorithms_spark.pipeline.dedup import tokens_expr

__all__ = ["pii_scrub", "c4_quality_filter",
           "EMAIL_RE", "IPV4_RE", "PHONE_RE"]

# Patterns deliberately limited to the Java-regex ∩ RE2 common dialect.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# leading '+' required so free-standing integers in prose survive
PHONE_RE = r"\+[0-9][0-9-]{6,}[0-9]"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ips, n_phones): emails, IPv4
    addresses and international-format phone numbers replaced by
    ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` tokens.

    The three scrubs apply in sequence (each counts on the PREVIOUS
    stage's text, so a string never double-counts: an address inside an
    already-scrubbed email is gone before the IP pass looks). One
    narrow map stage — three codegen'd ``regexp_replace`` calls per
    row, no shuffle, no UDF.
    """
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        t3.alias("clean_text"),
        F.regexp_count(t0, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t1, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(t2, F.lit(PHONE_RE)).alias("n_phones"),
    )


def c4_quality_filter(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 100_000,
    max_mean_word_len: float = 12.0,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """C4-style document gate: (doc_id, n_words, mean_word_len,
    blocklist_hits, keep).

    ``keep`` = word count in [min_words, max_words] AND mean word
    length ≤ max_mean_word_len AND zero blocklist tokens. Each signal
    is an in-row array expression over the canonical whitespace
    tokenizer (:func:`..pipeline.dedup.tokens_expr`), so the gate is a
    single map stage; the blocklist is a literal array (model-sized —
    real blocklists are thousands of words, still literal-sized)
    membership-checked per token, never a join.

    Empty docs: ``mean_word_len`` is 0.0 and they fail ``min_words``.
    """
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
    )
    mean_len = F.when(
        n > 0, total_len.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    if blocklist:
        bl = F.array(*[F.lit(w) for w in blocklist])
        hits: Column = F.size(
            F.filter(toks, lambda t: F.array_contains(bl, t))
        )
    else:
        hits = F.lit(0)
    out = docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(mean_len, 9).alias("mean_word_len"),
        hits.cast("long").alias("blocklist_hits"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("blocklist_hits") == 0)
    )
    return out.withColumn("keep", keep)
