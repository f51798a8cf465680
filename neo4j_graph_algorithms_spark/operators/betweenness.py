"""Betweenness centrality — parallel Brandes over a broadcast CSR.

Reference procedures re-expressed (SURVEY.md §2.4):

- ``algo.betweenness[.stream]`` (BetweennessCentralityProc.java:68-172;
  impl/betweenness/BetweennessCentrality.java, ParallelBetweennessCentrality.java):
  exact Brandes — per source s, BFS computes σ (shortest-path counts)
  and predecessor sets, then a reverse sweep accumulates
  δ(v) += σ(v)/σ(w)·(1+δ(w)) (BetweennessCentrality.java:161-168);
  direction OUTGOING by default, contributions halved when BOTH
  (divisor, BetweennessCentrality.java:53,69).
- ``algo.betweenness.sampled.stream`` — RA-Brandes
  (RABrandesBetweennessCentrality.java): run the same accumulation from
  a random subset of sources and scale contributions by
  f = n/|sample| (:269 ``centrality.add(node, f * delta)``).

Spark restatement: the reference runs one Brandes sweep per source on a
shared in-memory graph across a thread pool
(ParallelBetweennessCentrality.java) — the same shape distributes as
one task per source batch over a shared CSR with ``mapInPandas`` over
the source list; per-node partial δ sums then combine in one hash
aggregation.

The CSR never touches the driver: the deduplicated edge set is written
by Spark as a parquet **artifact** (executors write it in parallel) and
each Python worker process reads the artifact directly and assembles
the sorted-src CSR once, caching it process-wide — driver memory stays
O(1) regardless of |E|. On a multi-node cluster pass a shared
``artifact_dir`` (HDFS/S3/NFS); local mode defaults to a temp dir.

Like the reference, the graph must fit in (executor) memory — at web
scale this operator is only meaningful with aggressive source sampling
(``sample_fraction``), which is the approximation the reference itself
ships for that regime (RABrandesBetweennessCentrality.java). Above
``MAX_EXACT_SOURCES`` sources, sampling is mandatory: exact Brandes is
O(|V|·|E|) and a silent exact run at web scale is a mistake, not a
feature.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["betweenness_centrality"]

# exact Brandes above this many sources is O(V·E) compute — refuse and
# require explicit sample_fraction (RA-Brandes) instead
MAX_EXACT_SOURCES = 50_000

# per-Python-worker-process artifact cache: path -> (node_ids, src, dst)
_CSR_CACHE: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}


def _load_artifact(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Executor-side: read the edge/node parquet artifact and assemble
    the sorted-src arrays + node id universe, cached per process."""
    hit = _CSR_CACHE.get(path)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    et = pq.read_table(os.path.join(path, "edges"), columns=["src", "dst"])
    nt = pq.read_table(os.path.join(path, "nodes"), columns=["id"])
    src = et.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = et.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    vids = nt.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    node_ids = np.unique(np.concatenate([vids, src, dst]))
    _CSR_CACHE.clear()  # keep at most one graph per worker process
    _CSR_CACHE[path] = (node_ids, src, dst)
    return node_ids, src, dst


def _write_artifact(vertices: DataFrame, edges: DataFrame, direction: str,
                    artifact_dir: str | None) -> str:
    """Spark-side parallel write of the deduplicated (optionally
    symmetrized) edge set + vertex ids; returns the artifact root.

    Each run gets a UNIQUE subdirectory: reused Python worker processes
    cache the assembled CSR by path, so reusing one path for a
    different graph would silently serve the previous graph's
    adjacency."""
    import uuid

    base = artifact_dir or tempfile.mkdtemp(prefix="betweenness_csr_")
    root = os.path.join(base, f"run_{uuid.uuid4().hex}")
    e = edges.select("src", "dst")
    if direction == "both":
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e.dropDuplicates(["src", "dst"]).write.mode("overwrite").parquet(
        os.path.join(root, "edges"))
    vertices.select("id").write.mode("overwrite").parquet(
        os.path.join(root, "nodes"))
    return root


def brandes_batch(
    sources: np.ndarray,
    node_ids: np.ndarray,
    src_sorted: np.ndarray,
    dst_sorted: np.ndarray,
    scale: float,
    max_depth: int | None = None,
) -> dict[int, float]:
    """Exact Brandes accumulation from ``sources`` (dense ids) —
    vectorized level-synchronous forward BFS + reverse dependency sweep
    (≡ BetweennessCentrality.java:120-168).

    ``max_depth`` truncates each BFS at that depth
    (MaxDepthBetweennessCentrality.java:152-156): the reference breaks
    on the first dequeue past ``maxDepth``, so nodes at depth
    ``maxDepth+1`` are never stack-pushed and contribute nothing to any
    dependency — equivalent to Brandes over the BFS-truncated level
    sets 0..maxDepth, which is exactly what not expanding the
    depth-``maxDepth`` frontier computes (deeper nodes keep dist=-1 so
    the reverse sweep's child mask excludes them)."""
    n = len(node_ids)
    # dense remap
    s_dense = np.searchsorted(node_ids, src_sorted)
    d_dense = np.searchsorted(node_ids, dst_sorted)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, s_dense + 1, 1)
    np.cumsum(indptr, out=indptr)
    delta_sum = np.zeros(n, dtype=np.float64)

    for s in sources:
        sigma = np.zeros(n, dtype=np.float64)
        dist = np.full(n, -1, dtype=np.int64)
        sigma[s] = 1.0
        dist[s] = 0
        frontier = np.array([s], dtype=np.int64)
        levels = [frontier]
        d = 0
        while len(frontier) and (max_depth is None or d < max_depth):
            # gather all out-edges of the frontier at once
            starts = indptr[frontier]
            ends = indptr[frontier + 1]
            counts = ends - starts
            if counts.sum() == 0:
                break
            srcs_rep = np.repeat(frontier, counts)
            idx = np.concatenate(
                [np.arange(a, b) for a, b in zip(starts, ends)]
            )
            tgts = d_dense[idx]
            new_mask = dist[tgts] == -1
            tree_mask = new_mask | (dist[tgts] == d + 1)
            # σ accumulates along BFS-tree edges
            np.add.at(sigma, tgts[tree_mask], sigma[srcs_rep[tree_mask]])
            newly = np.unique(tgts[new_mask])
            dist[newly] = d + 1
            frontier = newly
            if len(newly):
                levels.append(newly)
            d += 1
        # reverse sweep
        delta = np.zeros(n, dtype=np.float64)
        for lvl in reversed(levels[1:]):
            starts = indptr[lvl]
            ends = indptr[lvl + 1]
            counts = ends - starts
            if counts.sum():
                srcs_rep = np.repeat(lvl, counts)
                idx = np.concatenate(
                    [np.arange(a, b) for a, b in zip(starts, ends)]
                )
                tgts = d_dense[idx]
                child = dist[tgts] == dist[srcs_rep] + 1
                contrib = np.zeros(n, dtype=np.float64)
                np.add.at(
                    contrib,
                    srcs_rep[child],
                    sigma[srcs_rep[child]] / sigma[tgts[child]]
                    * (delta[tgts[child]] + 1.0),
                )
                delta += contrib
        delta[s] = 0.0
        delta_sum += delta * scale
    nz = np.nonzero(delta_sum)[0]
    return dict(zip(node_ids[nz].tolist(), delta_sum[nz].tolist()))


def betweenness_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    direction: str = "out",
    sample_fraction: float | None = None,
    strategy: str = "uniform",
    max_depth: int | None = None,
    seed: int = 42,
    artifact_dir: str | None = None,
) -> DataFrame:
    """(id, centrality). Exact when no sampling is requested;
    RA-Brandes otherwise (contributions scaled by n/|sample|,
    RABrandesBetweennessCentrality.java:269).

    ``strategy`` picks the RA-Brandes source-selection strategy, the
    reference's two shipped options:

    - ``'uniform'`` (RandomSelectionStrategy.java): Bernoulli at
      ``sample_fraction``.
    - ``'degree'`` (RandomDegreeSelectionStrategy.java:59-63): each
      vertex selected with probability ``deg(v)/maxDeg`` — the
      published-better estimator on power-law graphs, where sampling
      hubs first covers far more shortest paths per sweep.
      ``sample_fraction`` is ignored (the reference strategy has no
      rate knob; the degree ratio IS the rate). The Bernoulli draw is
      a deterministic md5 hash of ``(id, seed)`` compared in pure
      integer arithmetic (``h·maxDeg < deg·2^20``) so runs — and the
      driver's DuckDB oracle — reproduce exactly, unlike the
      reference's SecureRandom. Scaling stays the reference's uniform
      ``f = n/|sample|`` (:269), preserving output parity; an
      inverse-inclusion-probability estimator would be unbiased but is
      not what the reference computes.

    ``max_depth`` truncates every BFS at that depth
    (MaxDepthBetweennessCentrality.java) — composes with either
    strategy or with the exact path.

    Raises ``ValueError`` when an exact run would sweep more than
    ``MAX_EXACT_SOURCES`` sources — sample explicitly for large
    graphs. ``artifact_dir``: shared-filesystem root for the edge
    artifact on multi-node clusters (temp dir in local mode)."""
    if strategy not in ("uniform", "degree"):
        raise ValueError(f"unknown strategy {strategy!r}")
    spark = vertices.sparkSession
    divisor = 2.0 if direction == "both" else 1.0
    n_vertices = vertices.count()

    sources_df = vertices.select("id")
    scale = 1.0 / divisor
    if strategy == "degree":
        e = edges.select("src", "dst")
        if direction == "both":
            e = e.union(e.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
        deg = (
            e.where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("_deg"))
        )
        max_deg = deg.agg(F.max("_deg")).collect()[0][0] or 0
        if max_deg == 0:
            return vertices.select("id", F.lit(0.0).alias("centrality"))
        from ..pipeline.dedup import _h8

        h = _h8(F.concat(F.col("id").cast("string"),
                         F.lit(f"#btwdeg{seed}"))) % F.lit(1 << 20)
        sources_df = (
            sources_df.join(deg, "id", "left")
            .withColumn("_deg", F.coalesce("_deg", F.lit(0)))
            .where(h * F.lit(int(max_deg)) < F.col("_deg") * F.lit(1 << 20))
            .select("id")
        )
        n_sample = sources_df.count()
        if n_sample == 0:
            return vertices.select("id", F.lit(0.0).alias("centrality"))
        scale = (n_vertices / n_sample) / divisor
    elif sample_fraction is not None and sample_fraction < 1.0:
        sources_df = sources_df.sample(
            withReplacement=False, fraction=sample_fraction, seed=seed
        )
        n_sample = sources_df.count()
        if n_sample == 0:
            return vertices.select("id", F.lit(0.0).alias("centrality"))
        scale = (n_vertices / n_sample) / divisor
    elif n_vertices > MAX_EXACT_SOURCES:
        raise ValueError(
            f"exact betweenness over {n_vertices} sources is O(V*E); pass "
            f"sample_fraction (RA-Brandes) above {MAX_EXACT_SOURCES} vertices"
        )

    path = _write_artifact(vertices, edges, direction, artifact_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nids, ss, ds = _load_artifact(path)
        for pdf in batches:
            srcs_dense = np.searchsorted(nids, pdf["id"].to_numpy(dtype=np.int64))
            acc = brandes_batch(srcs_dense, nids, ss, ds, scale, max_depth)
            if acc:
                yield pd.DataFrame(
                    {"id": list(acc.keys()), "part": list(acc.values())}
                )

    n_tasks = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    partials = (
        sources_df.repartition(n_tasks)
        .mapInPandas(run, "id long, part double")
        .groupBy("id")
        .agg(F.sum("part").alias("centrality"))
    )
    result = (
        vertices.select("id")
        .join(partials, "id", "left")
        .select("id", F.coalesce("centrality", F.lit(0.0)).alias("centrality"))
        # materialize NOW so the O(|E|) artifact can be deleted — the
        # result is vertex-sized
        .localCheckpoint(eager=True)
    )
    import shutil

    # drop the run's artifact (and the whole temp root when we made it)
    shutil.rmtree(path if artifact_dir is not None
                  else os.path.dirname(path), ignore_errors=True)
    return result
