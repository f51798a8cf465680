"""Deterministic document sampling for training-data curation.

The two shapes a 100-TB pipeline needs:

- :func:`sample_documents` — Bernoulli sampling at a fixed ``fraction``
  (optionally per stratum, e.g. per language): keep a row iff a
  deterministic md5-derived hash of ``(doc_id, seed)`` falls under the
  fraction threshold. Map-only — no shuffle, no RNG state; the SAME
  rows are kept on every run, on any cluster, and in the DuckDB oracle
  (seeded-RNG builtins are engine-specific; a hash threshold is not).
- :func:`stratified_sample_exact` — exactly ``k`` docs per stratum,
  chosen by hash order (a deterministic "random" order): one
  ``row_number`` window per stratum. One shuffle by the stratum key;
  per-stratum skew is bounded because only rank ≤ k survives the sort
  (Spark's window sort spills; for pathological strata pre-filter with
  a generous Bernoulli pass first — ``prefilter_fraction`` does this
  automatically when set).

Both are engine extensions (the reference is a graph library and has no
sampling surface); they live beside dedup/quality because real curation
pipelines chain them: dedup → quality score → stratified downsample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from neo4j_graph_algorithms_spark.pipeline.dedup import _h8, _h15

__all__ = ["sample_documents", "stratified_sample_exact",
           "weighted_sample_exact", "mix_corpus",
           "temperature_mix"]

# hash threshold resolution: fraction is quantized to 1/2^20 — the
# deterministic analogue of a Bernoulli draw with 20 bits of precision
_RES = 1 << 20


def _sample_hash(seed: int) -> Column:
    """Uniform value in [0, 2^20) from (doc_id, seed) — md5-derived so
    DuckDB replays it bit-for-bit (same shape as dedup's base hash)."""
    key = F.concat(F.col("doc_id").cast("string"), F.lit(f"#smp{seed}"))
    return _h8(key) % F.lit(_RES)


def sample_documents(
    docs: DataFrame,
    fraction: float | None = None,
    *,
    by: str | None = None,
    fractions: dict[str, float] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli sample of the documents table.

    ``fraction`` applies one rate to every row. With ``by`` +
    ``fractions`` (e.g. ``by='lang', fractions={'en': 0.1, 'de': 0.5}``)
    each stratum gets its own rate; strata absent from the dict keep
    EVERYTHING (rate 1.0) — curation usually downsamples the dominant
    language and keeps the tail.

    Map-only: the filter is a pure function of ``(doc_id, seed)``, so
    it pushes into the scan, never shuffles, and composes with any
    downstream operator. Expected |sample| = Σ_s rate_s·|stratum_s|;
    exact counts need :func:`stratified_sample_exact`.
    """
    h = _sample_hash(seed)
    if fractions is not None:
        if by is None:
            raise ValueError("fractions requires by=<stratum column>")
        # nested whens in sorted-key order (deterministic plan text)
        expr = F.lit(_RES)
        for val, fr in sorted(fractions.items()):
            expr = F.when(F.col(by) == F.lit(val),
                          F.lit(int(fr * _RES))).otherwise(expr)
        return docs.filter(h < expr)
    if fraction is None:
        raise ValueError("pass fraction or fractions")
    return docs.filter(h < F.lit(int(fraction * _RES)))


def stratified_sample_exact(
    docs: DataFrame,
    k: int,
    *,
    by: str = "lang",
    seed: int = 0,
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` docs per stratum, selected and
    ordered by the deterministic sample hash (ties broken by doc_id, so
    the result set is unique). One shuffle on the stratum key.

    ``prefilter_fraction`` bounds window-sort input on huge strata: a
    Bernoulli pass at that rate runs first (map-only), then the exact
    top-k — statistically safe whenever ``rate·|stratum| ≫ k``.
    """
    base = docs
    if prefilter_fraction is not None:
        base = sample_documents(base, prefilter_fraction, seed=seed + 1)
    h = _sample_hash(seed)
    w = Window.partitionBy(by).orderBy(h.asc(), F.col("doc_id").asc())
    return (
        base.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def mix_corpus(
    docs: DataFrame,
    proportions: dict[str, float],
    *,
    by: str = "source",
    seed: int = 0,
    total: int | None = None,
) -> DataFrame:
    """Deterministic corpus mixing: downsample strata so the output
    hits target ``proportions`` exactly (the training-mixture step —
    e.g. ``{'web': 0.6, 'code': 0.3, 'books': 0.1}``).

    The output size is the largest total the corpus can support: with
    ``n_s`` docs available in stratum ``s`` and target share ``p_s``,
    ``scale = min_s n_s / p_s`` (optionally capped by ``total``) and
    each stratum contributes exactly ``k_s = floor(p_s · scale)`` docs
    — the binding stratum is taken (nearly) whole, the rest are
    downsampled. Within a stratum, survivors are the ``k_s`` docs with
    the smallest deterministic sample hash (ties by doc_id), the same
    rule as :func:`stratified_sample_exact`, so the result is unique
    and engine-independent.

    Cost: one model-sized count aggregation (|strata| rows to the
    driver), then ONE shuffle on the stratum key for the per-stratum
    top-k window. Strata not named in ``proportions`` are dropped
    (share 0).
    """
    if not proportions or any(p < 0 for p in proportions.values()):
        raise ValueError("proportions must be non-negative, non-empty")
    pos = {s: p for s, p in proportions.items() if p > 0}
    counts = {
        r[by]: int(r["n"])
        for r in docs.filter(F.col(by).isin(list(pos)))
        .groupBy(by).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return docs.filter(F.lit(False))
    scale = min(counts.get(s, 0) / p for s, p in pos.items())
    if total is not None:
        scale = min(scale, float(total))
    ks = [(s, int(p * scale)) for s, p in pos.items()]
    k_df = F.broadcast(
        docs.sparkSession.createDataFrame(ks, f"{by} string, _k long"))

    h = _sample_hash(seed)
    w = Window.partitionBy(by).orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.join(k_df, by)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_k"))
        .drop("_rk", "_k")
    )


def temperature_mix(
    docs: DataFrame,
    *,
    by: str = "lang",
    alpha: float = 0.5,
    seed: int = 0,
    total: int | None = None,
) -> DataFrame:
    """Temperature-based mixture sampling (the mT5/XLM-R multilingual
    rebalancing step): stratum shares ∝ n_sᵅ with ``alpha`` ∈ (0, 1] —
    alpha = 1 keeps natural proportions, smaller alpha flattens the
    distribution toward the low-resource strata (downsample-only: the
    binding stratum is the one whose natural count can't support its
    boosted share; everything else is cut to match).

    Delegates to :func:`mix_corpus` with weights computed from a
    model-sized count aggregation. Weights are passed UNNORMALIZED
    (``w_s = n_sᵅ``) when ``total`` is None — mix_corpus's scale ratio
    cancels any common factor, and skipping the normalizing sum keeps
    the arithmetic a chain of correctly-rounded ops (pow, div, min,
    mul, floor) that a SQL oracle replays bit-for-bit with no
    summation-order hazard. With ``total``, weights are normalized so
    ``total`` caps the overall output count.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    counts = {
        r[by]: int(r["n"])
        for r in docs.groupBy(by).agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r[by] is not None
    }
    if not counts:
        return docs.filter(F.lit(False))
    props = {s: float(n) ** alpha for s, n in counts.items()}
    if total is not None:
        z = sum(props.values())
        props = {s: w / z for s, w in props.items()}
    return mix_corpus(docs, props, by=by, seed=seed, total=total)


def weighted_sample_exact(
    docs: DataFrame,
    k: int,
    *,
    weight_col: str,
    by: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(k, n)`` rows sampled WITHOUT replacement with
    inclusion probability increasing in ``weight_col`` — the
    Efraimidis-Spirakis A-ES scheme (IPL 2006): each row draws a
    deterministic uniform ``u ∈ (0, 1]`` from (doc_id, seed) and the k
    LARGEST priorities ``u^(1/w)`` win. One pass, one shuffle; exactly
    the weighted analogue of :func:`stratified_sample_exact` (``by``
    restricts the top-k to each stratum).

    Length-weighted corpus selection (w = n_chars or a host-rank join)
    is the standard web-pipeline use: sampling documents proportional
    to their token budget rather than per-document.

    Determinism contract: priorities are compared as
    ``round(ln(u)/w, 12)`` (monotone in ``u^(1/w)``) with a doc_id
    tie-break — ln/pow kernels differ across engines by ulps, and the
    12-dp rounding puts both engines' values on the same grid (the
    house contract of tfidf's 9-dp scores, tighter here because
    priorities cluster near 0). Rows with ``w <= 0`` are excluded
    (zero-weight items have inclusion probability 0 in A-ES).
    """
    u = (_h15(F.concat(F.col("doc_id").cast("string"),
                       F.lit(f"#wsmp{seed}"))) + 1).cast("double") \
        / float(1 << 60)
    w = F.col(weight_col).cast("double")
    pri = F.round(F.log(u) / w, 12)
    base = (
        docs.where(w > 0)
        .withColumn("_pri", pri)
    )
    part = [by] if by else []
    win = Window.partitionBy(*part).orderBy(
        F.desc("_pri"), F.asc("doc_id"))
    return (
        base.withColumn("_rk", F.row_number().over(win))
        .where(F.col("_rk") <= k)
        .drop("_pri", "_rk")
    )
