"""Closeness-family centralities via multi-source BFS.

Reference procedures re-expressed (SURVEY.md §2.4):

- ``algo.closeness[.stream]`` (ClosenessCentralityProc.java:62-119,
  impl/closeness/MSClosenessCentrality.java): farness(v) = Σ_s d(s→v)
  accumulated by a multi-source BFS (impl/msbfs/MultiSourceBFS.java);
  component(v) = number of nodes reachable FROM v; centrality =
  component/farness, 0 when farness is 0
  (MSBFSCCAlgorithm.java:49-57). Wasserman-Faust variant multiplies by
  (component-1)/(n-1). Direction OUTGOING
  (ClosenessCentralityProc.java:76).
- ``algo.closeness.harmonic`` (HarmonicCentralityProc.java:58-94,
  impl/closeness/HarmonicCentrality.java:63-83): inverse farness
  Σ_s 1/d(s→v) over Direction.BOTH, normalized by (n-1).
- ``algo.closeness.dangalchev`` (DangalchevCentralityProc.java,
  impl/DangalchevClosenessCentrality.java:59-77): Σ_s 2^{-d(s→v)} over
  Direction.OUTGOING, unnormalized.

The reference's MS-BFS packs 32 sources per bit-mask long
(MultiSourceBFS.java:36-60) — a shared-memory trick. The Spark
restatement is a level-synchronous frontier of (source, node) pairs:
one join + dedup per depth, every (source, node) visited at most once
(its minimal depth), exactly the visit stream the BfsConsumer sees.
All-pairs state is O(n·reach) — at web scale the exact mode REFUSES to
run above ``MAX_EXACT_SOURCES`` vertices; pass ``sample_fraction`` for
the sampled estimator (Eppstein-Wang style): every per-target sum over
sources is computed over a seeded source sample and scaled by
n/|sample| — unbiased for farness/harmonic/dangalchev sums. The
closeness ``component(v)`` term (nodes reachable FROM v) is estimated
by the scaled count of sampled sources REACHING v — identical for
direction='both'/undirected graphs, an approximation on directed ones
(documented deviation; the reference has no sampled closeness at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "ms_bfs_distances",
    "closeness_centrality",
    "harmonic_centrality",
    "dangalchev_centrality",
]

# exact all-sources MS-BFS above this many vertices is O(V·reach) state
MAX_EXACT_SOURCES = 100_000


def _pick_sources(vertices: DataFrame, sample_fraction: float | None,
                  seed: int, op: str) -> tuple[DataFrame | None, float]:
    """(sources, scale): sampled sources + the n/|sample| scale factor,
    or (None, 1.0) for exact mode (guarded)."""
    n = vertices.count()
    if sample_fraction is None or sample_fraction >= 1.0:
        if n > MAX_EXACT_SOURCES:
            raise ValueError(
                f"exact {op} sweeps all {n} sources (O(V*reach) state); "
                f"pass sample_fraction above {MAX_EXACT_SOURCES} vertices"
            )
        return None, 1.0
    sources = vertices.select("id").sample(
        withReplacement=False, fraction=sample_fraction, seed=seed).persist()
    n_s = sources.count()
    if n_s == 0:
        raise ValueError("sample_fraction produced an empty source sample")
    return sources, n / n_s


def _directed(edges: DataFrame, direction: str) -> DataFrame:
    e = edges.select("src", "dst")
    if direction == "out":
        return e
    if direction == "in":
        return e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    # both — symmetric closure (≡ loadAsUndirected merge,
    # GraphSetup.java:83-84)
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates(["src", "dst"])


def ms_bfs_distances(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    sources: DataFrame | None = None,
    direction: str = "out",
    max_depth: int | None = None,
) -> DataFrame:
    """(source, id, distance≥1) for every (source, node) pair reachable
    in ``direction`` — the visit stream of the reference's MS-BFS
    (each pair visited once, at its minimal depth; the source itself is
    pre-visited at depth 0 and never emitted,
    MultiSourceBFS.java:36-60)."""
    from neo4j_graph_algorithms_spark.plans.loop_conf import superstep_conf

    spark = vertices.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # static join side pre-partitioned + pre-sorted on src once — the
    # per-depth SMJ streams cached partitions with no exchange/re-sort
    e = (_directed(edges, direction).repartition(n_shuffle, "src")
         .sortWithinPartitions("src").persist())
    if sources is None:
        sources = vertices.select("id")
    visited = sources.select(
        F.col("id").alias("source"), F.col("id").alias("id"),
        F.lit(0).cast("long").alias("distance"),
    ).persist()
    frontier = visited.select("source", "id")
    depth = 0
    out = None
    with superstep_conf(spark):
        while True:
            depth += 1
            if max_depth is not None and depth > max_depth:
                break
            nxt = (
                e.join(frontier.withColumnRenamed("id", "src"), "src")
                .select("source", F.col("dst").alias("id"))
                .distinct()
                .join(visited.select("source", "id"), ["source", "id"],
                      "left_anti")
                .withColumn("distance", F.lit(depth).cast("long"))
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            new_visited = visited.union(nxt).localCheckpoint(eager=True)
            visited.unpersist()
            visited = new_visited
            out = visited
            frontier = nxt.select("source", "id")
    e.unpersist()
    result = (out if out is not None else visited).filter(
        F.col("distance") >= 1
    )
    return result


def closeness_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    wasserman_faust: bool = False,
    direction: str = "out",
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """(id, centrality) — component(v)/farness(v) with farness summed
    over distances TO v and component counting nodes reachable FROM v
    (MSClosenessCentrality.java:72-85, MSBFSCCAlgorithm.java:49-57).

    ``sample_fraction``: sampled estimator (see module docstring);
    mandatory above MAX_EXACT_SOURCES vertices."""
    n = vertices.count()
    sources, scale = _pick_sources(vertices, sample_fraction, seed,
                                   "closeness")
    pairs = ms_bfs_distances(vertices, edges, direction=direction,
                             sources=sources).persist()
    farness = pairs.groupBy("id").agg(
        (F.sum("distance") * F.lit(scale)).alias("farness"))
    if sources is None:
        component = pairs.groupBy(F.col("source").alias("id")).agg(
            F.count(F.lit(1)).alias("component")
        )
    else:
        # scaled count of sampled sources reaching v (== reach FROM v
        # when the direction is symmetric)
        component = pairs.groupBy("id").agg(
            (F.count(F.lit(1)) * F.lit(scale)).alias("component"))
    base = (
        vertices.select("id")
        .join(farness, "id", "left")
        .join(component, "id", "left")
        .select(
            "id",
            F.coalesce("farness", F.lit(0)).alias("farness"),
            F.coalesce("component", F.lit(0)).alias("component"),
        )
    )
    cc = F.col("component") / F.col("farness")
    if wasserman_faust:
        cc = cc * ((F.col("component") - 1) / F.lit(max(n - 1, 1)))
    result = base.select(
        "id",
        F.when(F.col("farness") == 0, F.lit(0.0)).otherwise(cc)
        .alias("centrality"),
    )
    out = result.localCheckpoint(eager=True)
    pairs.unpersist()
    if sources is not None:
        sources.unpersist()
    return out


def harmonic_centrality(vertices: DataFrame, edges: DataFrame, *,
                        sample_fraction: float | None = None,
                        seed: int = 42) -> DataFrame:
    """(id, centrality) = Σ_s 1/d(s→v) / (n-1), Direction.BOTH
    (HarmonicCentrality.java:63-83). ``sample_fraction``: unbiased
    sampled estimator, mandatory above MAX_EXACT_SOURCES vertices."""
    n = vertices.count()
    sources, scale = _pick_sources(vertices, sample_fraction, seed,
                                   "harmonic")
    pairs = ms_bfs_distances(vertices, edges, direction="both",
                             sources=sources)
    inv = pairs.groupBy("id").agg(
        (F.sum(F.lit(1.0) / F.col("distance")) * F.lit(scale)
         / F.lit(max(n - 1, 1))).alias("centrality")
    )
    out = (
        vertices.select("id")
        .join(inv, "id", "left")
        .select("id", F.coalesce("centrality", F.lit(0.0)).alias("centrality"))
        .localCheckpoint(eager=True)
    )
    if sources is not None:
        sources.unpersist()
    return out


def dangalchev_centrality(vertices: DataFrame, edges: DataFrame, *,
                          sample_fraction: float | None = None,
                          seed: int = 42) -> DataFrame:
    """(id, centrality) = Σ_s 2^{-d(s→v)}, Direction.OUTGOING,
    unnormalized (DangalchevClosenessCentrality.java:59-77).
    ``sample_fraction``: unbiased sampled estimator, mandatory above
    MAX_EXACT_SOURCES vertices."""
    sources, scale = _pick_sources(vertices, sample_fraction, seed,
                                   "dangalchev")
    pairs = ms_bfs_distances(vertices, edges, direction="out",
                             sources=sources)
    sc = pairs.groupBy("id").agg(
        (F.sum(F.pow(F.lit(2.0), -F.col("distance"))) * F.lit(scale))
        .alias("centrality")
    )
    out = (
        vertices.select("id")
        .join(sc, "id", "left")
        .select("id", F.coalesce("centrality", F.lit(0.0)).alias("centrality"))
        .localCheckpoint(eager=True)
    )
    if sources is not None:
        sources.unpersist()
    return out
