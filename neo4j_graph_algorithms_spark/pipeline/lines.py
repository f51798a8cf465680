"""Line-level corpus operators: global exact-line dedup and per-site
boilerplate detection.

Two standard web-text curation passes that work UNDER the document
level (the document-level twins live in ``pipeline/dedup.py``):

- :func:`line_dedup` — C4's "three-sentence span" rule reduced to the
  line granularity most pipelines actually ship (cf. Raffel et al.
  2020 §2.2; Penedo et al. 2023 RefinedWeb line-wise filter): every
  occurrence of an exact line except the globally FIRST one is
  removed, then documents are re-assembled from their surviving lines.
- :func:`boilerplate_scores` — CCNet/trafilatura-style template
  detection: a line occurring in at least ``frac`` of a site's
  documents is boilerplate (nav bars, cookie banners, footers); the
  per-document boilerplate share is the score used to gate or strip.

The reference engine has no text semantics (anonymous node ids) —
this is web-pipeline surface around it, like ``pipeline/dedup.py``.

Plan shape at 100 TB:

- ``line_dedup``: one explode (corpus-lines rows — the same order of
  magnitude as the token tables the dedup ops already build), ONE
  line-keyed aggregation with map-side combine (``min(struct(doc,
  pos))`` — output is distinct-line-sized), one line-keyed join back,
  one doc-keyed aggregation whose state is bounded by document size.
  The winner rule (global min ``(doc_id, pos)``) is a pure function of
  the input set — idempotent re-runs, no window over a global sort.
- ``boilerplate_scores``: lines are keyed by ``(site, line)``
  everywhere, so a line shared by EVERY site (e.g. "Home") never
  becomes a global hot key — the worst skew is the largest single
  site, the natural unit. Two aggregations + one broadcastable join
  of site totals + one join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["line_dedup", "boilerplate_scores"]


def _lines(docs: DataFrame, text_col: str, id_col: str,
           *extra: str) -> DataFrame:
    """(id, *extra, pos, line) — 0-based line position. An empty text
    yields one empty line (split semantics), so every doc has ≥1 row."""
    return docs.select(
        id_col, *extra,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def line_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global exact-line dedup, first occurrence wins.

    Returns ``(id_col, n_lines, kept_lines, clean_text)`` — one row per
    input document. ``clean_text`` joins the surviving lines in their
    original order; a document whose every line was seen earlier
    (ordered by ``(doc_id, pos)``) comes back with ``kept_lines = 0``
    and ``clean_text = ''`` so the caller decides the drop threshold.
    """
    lines = _lines(docs, text_col, id_col)
    winners = lines.groupBy("line").agg(
        F.min(F.struct(id_col, "pos")).alias("_w"))
    kept = (
        lines.join(winners, "line")
        .where((F.col(id_col) == F.col(f"_w.{id_col}"))
               & (F.col("pos") == F.col("_w.pos")))
        .select(id_col, "pos", "line")
    )
    surv = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    totals = docs.select(
        id_col,
        F.size(F.split(F.col(text_col), "\n")).cast("long")
        .alias("n_lines"),
    )
    return (
        totals.join(surv, id_col, "left")
        .select(
            id_col, "n_lines",
            F.coalesce(F.col("kept_lines"), F.lit(0)).cast("long")
            .alias("kept_lines"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def boilerplate_scores(
    docs: DataFrame,
    *,
    site_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    frac: float = 0.5,
    min_site_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate share from per-site line frequency.

    A line is boilerplate when it occurs in ``>= frac`` of its site's
    documents AND the site has ``>= min_site_docs`` documents (a
    single-page site would otherwise flag everything). Returns
    ``(id_col, n_lines, bp_lines, bp_frac)`` with ``bp_frac`` rounded
    to 6 places; every input document keeps a row.
    """
    lines = _lines(docs, text_col, id_col, site_col)
    presence = lines.select(site_col, "line", id_col).distinct()
    per_line = presence.groupBy(site_col, "line").agg(
        F.count(F.lit(1)).alias("_n_docs"))
    site_tot = docs.groupBy(site_col).agg(
        F.count(F.lit(1)).alias("_site_docs"))
    flagged = per_line.join(F.broadcast(site_tot), site_col).select(
        site_col, "line",
        ((F.col("_n_docs") >= F.col("_site_docs") * F.lit(frac))
         & (F.col("_site_docs") >= min_site_docs)).alias("_is_bp"),
    )
    scored = lines.join(flagged, [site_col, "line"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_is_bp").cast("long")).alias("bp_lines"),
        F.round(F.sum(F.col("_is_bp").cast("double")) / F.count(F.lit(1)),
                6).alias("bp_frac"),
    )
