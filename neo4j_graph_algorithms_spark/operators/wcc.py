"""Weakly connected components (union-find / WCC).

Semantics match ``algo.unionFind`` (reference:
algo/.../UnionFindProc.java:51-91, impl GraphUnionFind.java:57-99 +
DisjointSetStruct.java): edges union their endpoints; an optional
``threshold`` unions only when ``weight >= threshold``
(GraphUnionFind.java:82-99; config UnionFindProcExec.java:283-299).

Output: ``(id, component)`` where ``component`` is the **minimum member
id** of the component. The reference emits DSS roots — implementation
artifacts; its own tests assert only partition equivalence
(tests/.../UnionFindsTest.java:128-154) — so min-member canonicalization
is the documented deterministic choice.

Physical plan (not a port of the DSS merge tree — its distributed
restatement):

1. optional **partition-local union-find** inside ``mapInPandas``
   (≡ the local DSS each ``UnionFindTask`` builds over its edge batch,
   ParallelUnionFindQueue.java:117-153): each task collapses its edge
   partition to star edges ``(node → local min)``, shrinking the edge
   set before any shuffle;
2. iterated **min-label propagation + pointer jumping** over the
   (symmetrized) star edges (≡ the pairwise DSS ``merge`` reduction,
   DisjointSetStruct.java:61-75): per round every node takes the min
   label among itself and its neighbors, then follows its label's label
   (pointer doubling) — convergence in ~log(diameter) rounds;
3. stop when no label changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.plans.checkpoint import CheckpointManager
from neo4j_graph_algorithms_spark.plans.loop_conf import superstep_conf

__all__ = ["connected_components", "connected_components_incremental",
           "community_stats", "WccResult"]


def community_stats(components: DataFrame, *,
                    component_col: str = "component") -> DataFrame:
    """Single-row community-size statistics — the reference's write-mode
    YIELD surface: ``setCount`` plus size-distribution percentiles
    (UnionFindProcExec.java:177-198, AbstractCommunityResultBuilder's
    HdrHistogram p* fields). Exact SQL ``percentile`` (linear
    interpolation) instead of HdrHistogram's lossy buckets — documented
    deviation, same role. Works for any (id, <label>) table: WCC
    components, LPA labels, Louvain communities, SCC partitions.

    Scale shape: ONE |V|-row hash aggregation (map-side combined) down
    to |C| rows, then a single-row aggregate — no joins, no windows.
    """
    sizes = components.groupBy(component_col).agg(
        F.count(F.lit(1)).alias("sz"))
    return sizes.agg(
        F.sum("sz").cast("long").alias("n_nodes"),
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.min("sz").cast("long").alias("min_size"),
        F.expr("percentile(sz, 0.25)").alias("p25"),
        F.expr("percentile(sz, 0.5)").alias("p50"),
        F.expr("percentile(sz, 0.75)").alias("p75"),
        F.expr("percentile(sz, 0.9)").alias("p90"),
        F.expr("percentile(sz, 0.95)").alias("p95"),
        F.expr("percentile(sz, 0.99)").alias("p99"),
        F.max("sz").cast("long").alias("max_size"),
    )


@dataclass
class WccResult:
    components: DataFrame  # (id: long, component: long)
    iterations: int
    converged: bool
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _local_dss_collapse(edges_sym: DataFrame) -> DataFrame:
    """Per-partition union-find → star edges (node, root=local min member).

    Runs once over the raw edge partitions; pure per-partition work, no
    shuffle. Path-halving union-by-value keeps the min id at the root so
    output labels are already locally canonical.
    """

    def collapse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
                rs, rd = find(int(s)), find(int(d))
                if rs != rd:
                    # union by min id — keeps labels canonical locally
                    lo, hi = (rs, rd) if rs < rd else (rd, rs)
                    parent[hi] = lo
        if parent:
            nodes = list(parent.keys())
            yield pd.DataFrame(
                {"src": nodes, "dst": [find(n) for n in nodes]}
            ).astype("int64")

    return edges_sym.mapInPandas(collapse, "src long, dst long")


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    threshold: float | None = None,
    max_iterations: int = 50,
    local_dss: bool = True,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    edges_prelayout: bool = False,
    spark: SparkSession | None = None,
) -> WccResult:
    """Compute WCC labels ``(id, component=min member id)``.

    ``edges_prelayout``: set when ``edges`` comes from a PRE-SYMMETRIZED
    src-bucketed, src-sorted table
    (``sources.bucketed.write_edges_bucketed(symmetrize=True)``) — the
    stored layout replaces both the read-time symmetrization (whose
    reversed half would be keyed by the other endpoint, destroying the
    buckets) and the per-run repartition+sort, so edge rows are never
    shuffled. The local-DSS pre-collapse is skipped in this mode: its
    rewritten star edges would need a fresh shuffle, forfeiting the
    layout the mode exists to exploit.
    """
    spark = spark or vertices.sparkSession

    e = edges
    if threshold is not None:
        # union only if weight >= threshold (GraphUnionFind.java:82-99)
        e = e.filter(F.col("weight") >= float(threshold))
    e = e.select("src", "dst").filter(F.col("src") != F.col("dst"))

    if edges_prelayout:
        # narrow ops only above the bucketed scan (filter/select keep
        # HashPartitioning(src)); pin bucketed reading on for the cache
        # build and re-assert the bucket files' sort order at the cache
        # boundary — same two planner subtleties as pagerank's
        # edges_prelayout branch (operators/pagerank.py)
        auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        prev_auto = spark.conf.get(auto_key, "true")
        spark.conf.set(auto_key, "false")
        try:
            work = e.sortWithinPartitions("src").persist()
            work.count()
        finally:
            spark.conf.set(auto_key, prev_auto)
    else:
        sym = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

        if local_dss:
            stars = _local_dss_collapse(sym).dropDuplicates(["src", "dst"])
            work = stars.union(
                stars.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            ).filter(F.col("src") != F.col("dst"))
        else:
            work = sym
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        # pre-partition + pre-sort on the join key: each min-label round's
        # sort-merge join then streams the cached edge partitions with no
        # exchange/re-sort; only the vertex-sized label table moves
        work = (
            work.repartition(shuffle_n, "src").sortWithinPartitions("src").persist()
        )
        work.count()

    labels = vertices.select("id", F.col("id").alias("component"))
    ckpt = CheckpointManager(spark, checkpoint_dir, checkpoint_interval,
                             algorithm="wcc")
    resumed = ckpt.resume()
    if resumed is not None:
        start_it, labels = resumed
    else:
        start_it = 0

    converged = False
    it = start_it
    with superstep_conf(spark, vertices.count()):
        for it in range(start_it + 1, max_iterations + 1):
            nbr_min = (
                work.join(labels.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("component").alias("_nmin"))
            )
            stepped = (
                labels.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.least(F.col("component"), F.coalesce(F.col("_nmin"), F.col("component"))
                            ).alias("component"),
                    F.col("component").alias("_prev"),
                )
            )
            # pointer jump: component ← component(component)
            jump_tbl = stepped.select(
                F.col("id").alias("component"), F.col("component").alias("_jump")
            )
            new_labels = (
                stepped.join(jump_tbl, "component", "left")
                .select(
                    "id",
                    F.least(F.col("component"), F.coalesce(F.col("_jump"), F.col("component"))
                            ).alias("component"),
                    "_prev",
                )
            )
            new_labels, info = ckpt.maybe_checkpoint(
                new_labels, it,
                action=lambda df: {
                    "changed": df.filter(F.col("component") != F.col("_prev")).count()
                },
            )
            changed = info["changed"]
            labels = new_labels.select("id", "component")
            if changed == 0:
                converged = True
                break

    work.unpersist()
    return WccResult(labels, it, converged, list(ckpt.metrics))


def connected_components_incremental(
    prev_components: DataFrame,
    new_edges: DataFrame,
    *,
    max_iterations: int = 50,
    spark: SparkSession | None = None,
) -> WccResult:
    """Merge *added* edges into existing WCC labels without touching
    the old edge table — the daily-crawl-delta path.

    Because labels are canonical min-member ids, edge additions only
    ever MERGE components, and the merge is fully determined by the
    delta-sized *contracted* graph: map each new edge ``(u, v)`` to
    ``(comp(u), comp(v))``, run WCC over those contracted edges (a
    graph with one node per touched component — |Δ|-sized, independent
    of |E|), and re-label: ``comp'(x) = merged(comp(x))``. min-id
    canonicalization survives contraction (min over a union of
    components = min of their min ids), so the output is exactly
    ``connected_components(V, E_old ∪ E_new)`` — the driver oracle
    replays precisely that on the full edge set.

    Cost at 10^12-edge scale: two vertex-table joins against the
    (typically broadcastable) delta endpoints + one WCC on a |Δ|-sized
    graph + one label-table join — the 10^12-row edge table is never
    read. Endpoints absent from ``prev_components`` (new pages) seed
    their own singleton component first. Edge DELETIONS can split
    components and need the full recompute — not handled here.
    """
    spark = spark or prev_components.sparkSession

    e = (new_edges.select("src", "dst")
         .filter(F.col("src") != F.col("dst")).dropDuplicates())
    # seed unseen endpoints as singletons so the contraction join is total
    ends = (e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id"))).distinct())
    fresh = (ends.join(prev_components.select("id"), "id", "left_anti")
             .select("id", F.col("id").alias("component")))
    base = prev_components.select("id", "component").unionByName(fresh)

    # contract: new edges in component-id space. The delta endpoint set
    # is small → broadcast it so the (vertex-sized) label table is
    # joined map-side, no shuffle of `base`.
    lab = base
    half = F.broadcast(e).join(
        lab.withColumnRenamed("id", "src")
           .withColumnRenamed("component", "_cs"), "src")
    contracted = (
        F.broadcast(half)
        .join(lab.withColumnRenamed("id", "dst")
              .withColumnRenamed("component", "_cd"), "dst")
        .select(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )
    cv = (contracted.select(F.col("src").alias("id"))
          .union(contracted.select(F.col("dst").alias("id"))).distinct())
    merged = connected_components(
        cv, contracted, max_iterations=max_iterations, local_dss=False,
        spark=spark,
    )
    remap = merged.components.select(
        F.col("id").alias("component"), F.col("component").alias("_newc"))
    out = (
        base.join(F.broadcast(remap), "component", "left")
        .select("id",
                F.coalesce(F.col("_newc"), F.col("component"))
                .alias("component"))
    )
    return WccResult(out, merged.iterations, merged.converged,
                     list(merged.metrics))
