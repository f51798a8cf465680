"""Mergeable Count-Min Sketch tables — approximate frequencies.

The HLL tables (pipeline/sketches.py) answer "how many DISTINCT";
the other sketch a 100-TB corpus constantly needs is "how OFTEN" —
token/URL/host frequencies without materializing a full vocabulary
(heavy-hitter detection, stopword discovery, df-cutoff estimation for
the dedup joins). Count-Min (Cormode & Muthukrishnan, J. Algorithms
2005): D hash rows × W counters; an item adds 1 at ``(d, h_d(item))``
for every row; its estimate is the MIN over rows — never an
underestimate, overestimate bounded by ε·N with ε = e/W at depth
D = ln(1/δ).

Counters form a commutative monoid under per-cell ADDITION, so

    cms(A ∪ B) == merge(cms(A), cms(B))        (counter-EXACT)

in any order — the same durable-state algebra as the HLL tables, and
because every cell is an exact integer the driver oracle replays the
whole sketch bit-for-bit (no float anywhere).

Hashing is the portable md5 base hash (``dedup._h8``) of
``value || '#cms' || d`` mod W — replayable in DuckDB as
``('0x' || substr(md5(v || '#cms' || d), 1, 8))::BIGINT % W``.

Plan shape: build = one in-row expansion to D (d, idx) pairs (D is
4-8, not a corpus blowup) + ONE (d, idx)-keyed count aggregation with
map-side combine — the shuffled rows are bounded by D·W per partition
(the partial aggregates), independent of corpus size. Merge = one
keyed outer join. Estimate = the items joined to the D·W table on
(d, idx), then a min aggregation per item — broadcast-sized when the
sketch is (D·W rows always is).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _h8

__all__ = ["cms_build", "cms_merge", "cms_estimate"]

DEPTH = 4
WIDTH = 1024


def _cms_idx(value: Column, d: int, width: int) -> Column:
    """Row-``d`` counter index of a value — md5 base hash of the
    salted value, mod W (non-negative on both engines)."""
    return _h8(F.concat(value.cast("string"), F.lit(f"#cms{d}"))) \
        % F.lit(int(width))


def cms_build(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = DEPTH,
    width: int = WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """(d, idx, cnt) — the sparse D×W counter table (zero cells
    absent). ``weight_col`` adds that column instead of 1 per row
    (e.g. pre-aggregated token counts)."""
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    pairs = F.array(*[
        F.struct(F.lit(d).alias("d"),
                 _cms_idx(F.col(value_col), d, width).alias("idx"))
        for d in range(depth)
    ])
    return (
        df.select(F.explode(pairs).alias("p"), w.alias("_w"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.idx").alias("idx"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — the monoid merge. Exact: counting A then B
    equals counting A ∪ B."""
    return (
        a.select("d", "idx", F.col("cnt").alias("_ca"))
        .join(b.select("d", "idx", F.col("cnt").alias("_cb")),
              ["d", "idx"], "full_outer")
        .select(
            "d", "idx",
            (F.coalesce("_ca", F.lit(0)) + F.coalesce("_cb", F.lit(0)))
            .alias("cnt"),
        )
    )


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    value_col: str,
    *,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """(<items columns>, est_cnt) — the CMS point estimate
    ``min_d cnt[d, h_d(item)]`` for every item row. The sketch side is
    D·W rows at most — broadcast it, never shuffle the items."""
    probes = items.select(
        "*",
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     _cms_idx(F.col(value_col), d, width).alias("idx"))
            for d in range(depth)
        ])).alias("_p"),
    ).select("*", F.col("_p.d").alias("d"), F.col("_p.idx").alias("idx")) \
        .drop("_p")
    out_cols = items.columns
    return (
        probes.join(F.broadcast(cms), ["d", "idx"], "left")
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_cnt"))
    )
