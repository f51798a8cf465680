"""Model-based quality filtering — linear text-classifier inference.

The heuristic quality gates (pipeline/text.py quality scores, C4 rules
in pipeline/filtering.py) cover the rule-based half of a production
curation stack; the other half is a trained lightweight classifier
scored over every document (the GPT-3/LLaMA-style "quality filter":
fastText or logistic regression over hashed bag-of-words features,
applied at corpus scale to keep/drop or importance-weight documents).
The reference engine has no text surface at all (its graphs are
anonymous ids); this sits with the rest of the web-text pipeline
family around it.

Spark-first shape — inference is a MAP-ONLY pass:

- tokens come from the one canonical tokenizer (dedup.tokens_expr);
- each token hashes to a feature index with the same portable md5
  base hash the dedup family uses (``_h8 % n_features``);
- the per-token weight lookup and the per-document sum run IN-ROW via
  ``transform``/``aggregate`` higher-order functions — no explode, no
  join, no shuffle, whole-stage codegen; a 100 TB corpus scores in one
  scan (plus the broadcast of the weight table when one is supplied).

Two weight sources:

- ``weights=None`` (default): a deterministic pseudo-random weight
  function of the feature index (integer multiply-add-mod, exactly
  replayable in SQL) — the oracle-checkable stand-in for a trained
  model, same plan shape.
- ``weights=DataFrame (idx int, w double)``: a real (trained) weight
  vector; broadcast-joined after an in-row feature-count expansion.
  Same output contract.

Determinism contract (the default path): per-token weights are exact
INTEGERS in [-2^20, 2^20); the document margin numerator is their
exact integer sum (addition-order-free, unlike a float fold), and the
sigmoid input is ONE correctly-rounded double division of exact
integers — so both engines feed bit-identical doubles into exp(), and
the 9-dp rounding of the score grids the last-ulp exp() difference
(the house contract of tfidf's 9-dp scores). The keep decision avoids
floats entirely: sigmoid(x) >= 1/2 iff x >= 0, so ``keep`` compares
the integer numerator against the integer bias threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _h8, tokens_expr

__all__ = ["quality_classifier_score", "pseudo_weight_int"]

N_FEATURES = 1 << 18
# weight scale: integer weights in [-WSCALE, WSCALE) map to floats in
# [-1, 1) after division by WSCALE
WSCALE = 1 << 20
_MULT = 2654435761
_ADD = 1013904223


def pseudo_weight_int(idx: Column) -> Column:
    """Deterministic integer weight of a feature index: a multiply-
    add-mod hash mapped into [-2^20, 2^20). Pure int64 arithmetic
    (max intermediate < 2^18·2^32 + 2^31 < 2^63 — no overflow), so
    DuckDB replays it exactly."""
    return (idx * F.lit(_MULT) + F.lit(_ADD)) % F.lit(2 * WSCALE) \
        - F.lit(WSCALE)


def quality_classifier_score(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_features: int = N_FEATURES,
    bias: float = 0.0,
    weights: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, margin_num, score, keep) — linear classifier
    inference over hashed bag-of-words features.

    ``score = sigmoid(margin_num / (n_tokens · 2^20) + bias)`` with
    ``margin_num = Σ_t w(h(t) mod n_features)`` (mean-pooled hashed
    unigrams — the fastText inference rule with the embedding replaced
    by a scalar weight). Empty documents score ``sigmoid(bias)``.
    ``keep`` is the exact integer decision ``margin_num ≥ −bias·n·2^20``
    (no float boundary).

    Default path (``weights=None``) is map-only and oracle-replayable;
    pass a trained ``(idx int, w double)`` DataFrame for a real model —
    it is broadcast and the plan stays one scan + one broadcast join.
    """
    toks = tokens_expr(F.col(text_col))
    n_tok = F.size(toks)

    if weights is None:
        widx = lambda t: _h8(t) % F.lit(int(n_features))  # noqa: E731
        wints = F.transform(toks, lambda t: pseudo_weight_int(widx(t)))
        margin_num = F.when(n_tok == 0, F.lit(0).cast("long")).otherwise(
            F.aggregate(wints, F.lit(0).cast("long"), lambda a, x: a + x))
        base = docs.select(
            "doc_id",
            n_tok.cast("long").alias("n_tokens"),
            margin_num.alias("margin_num"),
        ).withColumn("_mnum_exact", F.col("margin_num").cast("double"))
    else:
        feats = docs.select(
            "doc_id", F.size(toks).cast("long").alias("n_tokens"),
            F.explode_outer(
                F.transform(toks, lambda t: _h8(t) % F.lit(int(n_features)))
            ).alias("idx"),
        )
        # weight sums are floats on this path (a trained model is not
        # integer-valued); margin_num carries the scaled sum ROUNDED for
        # a uniform output schema, but score/keep below use the exact
        # float sum — quantizing first could flip a keep decision whose
        # true and quantized margins straddle the -bias threshold
        joined = feats.join(F.broadcast(weights), "idx", "left")
        base = (
            joined.groupBy("doc_id", "n_tokens")
            .agg(F.sum(F.coalesce("w", F.lit(0.0))).alias("_wsum"))
            .select(
                "doc_id", "n_tokens",
                F.round(F.col("_wsum") * float(WSCALE))
                .cast("long").alias("margin_num"),
                (F.col("_wsum") * float(WSCALE)).alias("_mnum_exact"),
            )
        )

    margin = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
        F.col("_mnum_exact")
        / (F.col("n_tokens") * F.lit(float(WSCALE))))
    x = margin + F.lit(float(bias))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 9)
    # sigmoid(x) >= 1/2  <=>  x >= 0  <=>  margin_num >= -bias·n·2^20
    # (on the default path _mnum_exact IS margin_num, so the decision
    # stays integer-exact there)
    keep = (F.col("_mnum_exact")
            >= -F.lit(float(bias)) * F.col("n_tokens") * F.lit(float(WSCALE)))
    return base.select(
        "doc_id", "n_tokens", "margin_num",
        score.alias("score"), keep.alias("keep"),
    )
