"""Mergeable HLL distinct-count sketch tables.

``approx_count_distinct`` answers one query; a 100-TB warehouse wants
the SKETCH as durable state — per-key register tables that new data
folds into incrementally (distinct URLs per host over a growing crawl,
distinct n-grams per shard, …) without ever recounting history. HLL
registers form a commutative monoid under elementwise max, so:

    sketch(A ∪ B) == merge(sketch(A), sketch(B))     (register-EXACT)

in any drop order — the same latest-wins-style algebra the streaming
URL registry rides (streaming/dedup.py), here for cardinalities.

Register derivation is engine-portable by construction: ``u`` is the
60-bit ``_h15`` md5 hash (``pipeline/dedup.py`` contract, replayable
as ``('0x' || substr(md5(x),1,15))::BIGINT``), ``j = u mod m`` picks
the register, ``rho = 1 + ctz(u >> b)`` (capped at ``60 − b + 1``)
marks it. The estimate reuses ``operators/hyperball.py``'s
``hll_estimate_sql`` — ONE expression text evaluated by both engines,
so the double arithmetic agrees bit-for-bit.

Plan shape: sketch build is ONE hash aggregation (m small-int max
columns, map-side combine — never an explode); merge is one keyed
outer join with ``greatest`` per register; the estimate is a map-only
expression over the m columns. State size = |keys| × m small ints,
independent of data volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hll_group_sketches", "hll_merge_sketches",
           "hll_cardinality"]

_HASH_BITS = 60


def _rho_cols(value: Column, b: int) -> tuple[Column, Column]:
    """(register index j, rank rho) of one value's singleton sketch."""
    m = 1 << b
    u = F.conv(F.substring(F.md5(value), 1, 15), 16, 10).cast("long")
    j = (u % m).cast("int")
    # shiftright, NOT u/m: the 60-bit hash exceeds a double's 53-bit
    # mantissa, so float division could floor to the wrong quotient
    # (hyperball's u < 2^32 never hits this; DuckDB's // is exact)
    w = F.shiftright(u, b)                        # u >> b
    cap = _HASH_BITS - b + 1
    rho = F.when(w == 0, F.lit(cap)).otherwise(
        F.log2(w.bitwiseAND(-w)).cast("int") + 1)
    return j, rho


def hll_group_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    b: int = 6,
) -> DataFrame:
    """Per-key HLL sketch: ``(keys..., r0..r{m-1})`` with ``m = 2^b``.
    One hash aggregation — each register is a ``max`` over the rows'
    singleton ranks, partially combined map-side."""
    j, rho = _rho_cols(F.col(value_col), b)
    m = 1 << b
    base = df.select(*keys, j.alias("_j"), rho.alias("_rho"))
    aggs = [
        F.max(F.when(F.col("_j") == jj, F.col("_rho")).otherwise(0))
        .cast("int").alias(f"r{jj}")
        for jj in range(m)
    ]
    return base.groupBy(*keys).agg(*aggs)


def hll_merge_sketches(
    a: DataFrame,
    b_sketch: DataFrame,
    keys: list[str],
    *,
    b: int = 6,
) -> DataFrame:
    """Elementwise-max merge — the union sketch, register-exact in any
    merge order (max is a commutative monoid). Keys present on one
    side only pass through (absent registers are 0)."""
    m = 1 << b
    right = b_sketch.select(
        *keys, *[F.col(f"r{j}").alias(f"_br{j}") for j in range(m)])
    out = a.join(right, keys, "full_outer")
    cols = [
        F.greatest(F.coalesce(F.col(f"r{j}"), F.lit(0)),
                   F.coalesce(F.col(f"_br{j}"), F.lit(0)))
        .cast("int").alias(f"r{j}")
        for j in range(m)
    ]
    return out.select(*keys, *cols)


def hll_cardinality(
    sketches: DataFrame,
    keys: list[str],
    *,
    b: int = 6,
) -> DataFrame:
    """(keys..., distinct_est) — the standard bias-corrected estimate
    with the small-range linear-counting branch, via the SAME
    expression text the DuckDB oracle evaluates
    (operators/hyperball.py:hll_estimate_sql), rounded to 6 dp."""
    from neo4j_graph_algorithms_spark.operators.hyperball import (
        hll_estimate_sql,
    )

    m = 1 << b
    est = F.expr(hll_estimate_sql(m))
    return sketches.select(
        *keys, F.round(est, 6).alias("distinct_est"))
