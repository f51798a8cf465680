"""Co-citation and bibliographic coupling — the classic related-page
signals on web link graphs (Small 1973 / Kessler 1963; the pair basis
of SimRank-style relatedness and "similar pages" features):

- co-citation(a, b)  = #pages that link to BOTH a and b
  (shared in-link sources — pages cited together are related)
- coupling(a, b)     = #pages that BOTH a and b link to
  (shared out-links — pages citing the same things are related)

The reference's linkprediction procedures (CommonNeighborsProc etc.,
algo/.../similarity/ApproxNearestNeighborsAlgorithm-adjacent surface)
score GIVEN pairs; these operators MINE the pairs — the inverted-index
self-join shape of pipeline/dedup.py:token_jaccard_pairs applied to the
edge table.

100-TB shape: one equality self-join on the pivot column (the shared
source for co-citation, the shared target for coupling), never
all-pairs. A pivot shared by k endpoints yields k² candidate rows, so
hot pivots are pruned FIRST by ``pivot_cutoff`` (out-degree cutoff for
co-citation / in-degree for coupling — the df_cutoff trick): a
degree-10⁶ hub page would otherwise contribute 10¹² rows by itself.
The prune is principled, not just defensive — a page linking to a
million things says little about any pair of them (inverse-document-
frequency logic), which is why production co-citation systems cap
source fan-out the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["cocitation_pairs", "coupling_pairs"]


def _pair_counts(edges: DataFrame, pivot: str, item: str,
                 pivot_cutoff: int | None, min_count: int) -> DataFrame:
    e = edges.select(pivot, item).dropDuplicates()
    if pivot_cutoff is not None:
        ok = (
            e.groupBy(pivot).agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") <= int(pivot_cutoff)).select(pivot)
        )
        e = e.join(ok, pivot, "left_semi")
    a = e.select(pivot, F.col(item).alias("item_a"))
    b = e.select(pivot, F.col(item).alias("item_b"))
    return (
        a.join(b, pivot)
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= int(min_count))
    )


def cocitation_pairs(
    edges: DataFrame,
    *,
    pivot_cutoff: int | None = 1000,
    min_count: int = 1,
) -> DataFrame:
    """(item_a, item_b, n_common): pairs of pages co-cited by at least
    ``min_count`` common sources (item_a < item_b). Sources with
    out-degree above ``pivot_cutoff`` are pruned before the join."""
    return _pair_counts(edges, "src", "dst", pivot_cutoff, min_count)


def coupling_pairs(
    edges: DataFrame,
    *,
    pivot_cutoff: int | None = 1000,
    min_count: int = 1,
) -> DataFrame:
    """(item_a, item_b, n_common): pairs of pages linking to at least
    ``min_count`` common targets (item_a < item_b). Targets with
    in-degree above ``pivot_cutoff`` are pruned before the join."""
    return _pair_counts(edges, "dst", "src", pivot_cutoff, min_count)
