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

__all__ = ["cocitation_pairs", "coupling_pairs", "butterfly_count"]


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


def butterfly_count(
    edges: DataFrame,
    *,
    pivot_cutoff: int | None = 1000,
) -> DataFrame:
    """Global butterfly (2×2 biclique / 4-cycle) count of the directed
    bipartite src→dst incidence — the bipartite analogue of the
    triangle count (Sanei-Mehri, Sariyüce & Tirthapura, "Butterfly
    Counting in Bipartite Networks", KDD'18), THE cohesion motif for
    host↔page / page↔resource web structures where triangles cannot
    exist.

    Identity: a butterfly is an unordered pair of sources sharing an
    unordered pair of targets, so

        #butterflies = Σ over source-pairs C(#common targets, 2)

    i.e. one C(n,2) fold over :func:`coupling_pairs` — the wedge
    (pivot-keyed self-join) does all the work, nothing new shuffles.
    ``pivot_cutoff`` prunes hub targets first, exactly as in
    coupling_pairs; the returned count is over the pruned graph (at
    web scale an unpruned butterfly count is dominated by one
    degree-10⁶ hub's C(10⁶,2) wedges — the pruned count is the one a
    production system reports). One summary row
    ``(butterflies, wedge_pairs)``.
    """
    pairs = coupling_pairs(edges, pivot_cutoff=pivot_cutoff, min_count=2)
    return pairs.agg(
        F.coalesce(
            F.sum(F.col("n_common") * (F.col("n_common") - 1) / 2), F.lit(0.0)
        ).cast("long").alias("butterflies"),
        F.count(F.lit(1)).alias("wedge_pairs"),
    )
