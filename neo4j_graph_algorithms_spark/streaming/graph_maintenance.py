"""Continuously-maintained graph state over a stream of crawl edge deltas.

The batch operators already have incremental forms (``connected_components_
incremental``, ``pagerank_incremental``, ``triangle_count_incremental``) —
this module wires them into Structured Streaming so a running crawl
maintains its link-graph analytics instead of recomputing them per drop:
new WARC batches land as parquet files of (src, dst) edge deltas,
``foreachBatch`` folds each micro-batch into the durable state table, and
the state commit reuses :class:`~..plans.checkpoint.CheckpointManager`'s
parquet + metrics-line protocol, so every batch leaves a crash-resumable
(labels, lineage, wall/row metrics) snapshot behind.

Exactly-once EFFECT without two-phase commit: the streaming checkpoint
(``checkpointLocation``) pins WHICH files each batch id contains, so a
replayed micro-batch carries the same id and the same rows; each fold
first compares the batch id against the state manager's last COMMITTED
iteration and skips batches already folded (the commit protocol — parquet
then metrics line — makes "committed" unambiguous). Even without the
guard, WCC merging is idempotent (re-merging edges whose endpoints already
share a label is a no-op) and warm-started PageRank re-converges to the
same fixpoint; triangle-count maintenance is the genuinely non-idempotent
fold the guard exists for, plus a cross-batch anti-join so an edge
re-discovered by a LATER crawl batch never double-counts. Edge-store
writes go to a per-batch-id subdir with overwrite (idempotent), never
append.

Scale shape per micro-batch: the incremental WCC fold touches only
delta-sized contracted edges + one label-table join (the historical edge
table is never read — operators/wcc.py:241); the PageRank fold re-ranks
warm-started, paying only perturbation-decay supersteps. State volume is
one row per vertex, partitioned by id — horizontal, same as the batch
engine. The reference has no streaming surface at all (its graphs are
loaded once into the JVM heap — core/graphbuilder, LoadGraphProc.java);
this is the capability a 10^12-page continuously-crawled corpus needs.
"""

from __future__ import annotations

import os
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.pagerank import pagerank, pagerank_incremental
from ..operators.triangles import triangle_count, triangle_count_incremental
from ..operators.wcc import (
    connected_components,
    connected_components_incremental,
)
from ..plans.checkpoint import CheckpointManager

__all__ = [
    "EDGE_DELTA_SCHEMA",
    "run_component_maintenance",
    "run_labelprop_maintenance",
    "run_pagerank_maintenance",
    "run_triangle_maintenance",
]

EDGE_DELTA_SCHEMA = "src long, dst long"


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def _drive(
    spark: SparkSession,
    deltas_dir: str,
    state_dir: str,
    fold: Callable[[DataFrame, int], None],
    *,
    max_files_per_trigger: int = 1,
    schema: str = EDGE_DELTA_SCHEMA,
) -> None:
    """readStream the delta dir and run ``fold`` per micro-batch to
    completion (bounded input; on a cluster the identical plan tails a
    live directory / Kafka topic with .start() left running)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(deltas_dir)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_component_maintenance(
    spark: SparkSession,
    deltas_dir: str,
    state_dir: str,
    *,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Maintain WCC labels over streamed edge deltas; returns the final
    (id, component) state. Restartable: both the stream position and the
    label state resume from ``state_dir``."""
    mgr = CheckpointManager(spark, checkpoint_dir=os.path.join(
        state_dir, "wcc_state"), interval=1, algorithm="wcc_stream")
    resumed = mgr.resume()
    holder: dict[str, Any] = {
        "prev": resumed[1] if resumed else None,
        "committed": resumed[0] if resumed else -1,
    }

    def fold(batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= holder["committed"]:
            return  # crash-replayed batch: state already reflects it
        delta = batch.select("src", "dst").dropDuplicates(["src", "dst"])
        prev = holder["prev"]
        if prev is None:
            res = connected_components(_vertices(delta), delta)
        else:
            res = connected_components_incremental(prev, delta, spark=spark)
        labels = res.components.select("id", "component")
        n_delta = delta.count()

        def action(state: DataFrame) -> dict[str, Any]:
            agg = state.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("component").alias("c")).collect()[0]
            return {"vertices": int(agg["n"]),
                    "components": int(agg["c"]),
                    "delta_edges": n_delta,
                    "batch_id": int(batch_id)}

        state, _ = mgr.maybe_checkpoint(labels, int(batch_id), action=action)
        holder["prev"] = state
        holder["committed"] = int(batch_id)

    _drive(spark, deltas_dir, state_dir, fold,
           max_files_per_trigger=max_files_per_trigger)
    final = holder["prev"]
    if final is None:  # empty stream, no state yet
        return spark.createDataFrame([], "id long, component long")
    return final.select("id", "component")


def run_pagerank_maintenance(
    spark: SparkSession,
    deltas_dir: str,
    state_dir: str,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iterations: int = 100,
    rerank_every: int = 1,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Maintain converged PageRank over streamed edge deltas; returns the
    final (id, rank). Each fold appends the delta to the accumulated edge
    store (parquet append — the only growing state) and warm-starts from
    the previous ranks, paying only perturbation-decay supersteps.
    ``rerank_every=k`` folds edges every batch but re-ranks on every k-th
    (the crawl cadence knob: edge ingest is cheap, rank refresh amortized).
    The returned state is always ranked over ALL ingested edges."""
    edges_store = os.path.join(state_dir, "edges")
    mgr = CheckpointManager(spark, checkpoint_dir=os.path.join(
        state_dir, "rank_state"), interval=1, algorithm="pagerank_stream")
    resumed = mgr.resume()
    holder: dict[str, Any] = {
        "prev": resumed[1] if resumed else None,
        "committed": resumed[0] if resumed else -1,
        "since_rank": 0,
    }

    def rerank(batch_id: int, n_delta: int) -> None:
        edges = (
            spark.read.parquet(edges_store)
            .select("src", "dst").dropDuplicates(["src", "dst"])
        )
        v = _vertices(edges)
        prev = holder["prev"]
        if prev is None:
            res = pagerank(v, edges, damping=damping, tol=tol,
                           max_iterations=max_iterations)
        else:
            res = pagerank_incremental(
                v, edges, prev.select("id", "rank"), damping=damping,
                tol=tol, max_iterations=max_iterations)
        state, _ = mgr.maybe_checkpoint(
            res.ranks.select("id", "rank"), int(batch_id),
            delta_edges=n_delta, supersteps=res.iterations)
        holder["prev"] = state
        holder["committed"] = int(batch_id)

    def fold(batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= holder["committed"]:
            return
        delta = batch.select("src", "dst").dropDuplicates(["src", "dst"])
        n_delta = delta.count()
        delta.write.mode("overwrite").parquet(
            os.path.join(edges_store, f"batch={int(batch_id)}"))
        holder["last_batch"] = int(batch_id)
        holder["since_rank"] += 1
        if holder["since_rank"] >= rerank_every:
            rerank(int(batch_id), n_delta)
            holder["since_rank"] = 0

    _drive(spark, deltas_dir, state_dir, fold,
           max_files_per_trigger=max_files_per_trigger)
    if holder["since_rank"] > 0 and os.path.exists(edges_store):
        rerank(holder["last_batch"], 0)  # trailing partial rerank window
    final = holder["prev"]
    if final is None:
        return spark.createDataFrame([], "id long, rank double")
    return final.select("id", "rank")


def run_triangle_maintenance(
    spark: SparkSession,
    deltas_dir: str,
    state_dir: str,
    *,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Maintain per-node triangle counts over streamed edge deltas;
    returns the final (id, triangles, coefficient). The accumulated edge
    store doubles as the replay guard: a replayed micro-batch's edges are
    anti-joined away before the delta-wedge fold, so the non-idempotent
    increment never double-counts."""
    edges_store = os.path.join(state_dir, "edges")
    mgr = CheckpointManager(spark, checkpoint_dir=os.path.join(
        state_dir, "tri_state"), interval=1, algorithm="triangles_stream")
    resumed = mgr.resume()
    holder: dict[str, Any] = {
        "prev": resumed[1] if resumed else None,
        "committed": resumed[0] if resumed else -1,
    }

    def fold(batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= holder["committed"]:
            return  # crash-replayed batch: state already reflects it
        delta = batch.select("src", "dst").dropDuplicates(["src", "dst"])
        have_store = os.path.exists(edges_store)
        if have_store:
            # exclude this batch's own subdir: a crash between the store
            # write and the state commit replays the batch, and its
            # already-stored edges must still count as new
            old = (
                spark.read.parquet(edges_store)
                .filter(F.col("batch") != int(batch_id))
                .select("src", "dst")
            )
            # an edge re-discovered by a later crawl batch is not new
            delta = delta.join(old, ["src", "dst"], "left_anti")
        prev = holder["prev"]
        if prev is None or not have_store:
            res = triangle_count(_vertices(delta), delta)
        else:
            res = triangle_count_incremental(
                _vertices(old.union(delta)), old, delta,
                prev.select("id", "triangles"))
        n_delta = delta.count()
        # edge store first: if the state commit below crashes, the replay
        # guard (committed batch id) skips this batch anyway
        delta.write.mode("overwrite").parquet(
            os.path.join(edges_store, f"batch={int(batch_id)}"))
        state, _ = mgr.maybe_checkpoint(
            res.node_counts.select("id", "triangles", "coefficient"),
            int(batch_id), delta_edges=n_delta)
        holder["prev"] = state
        holder["committed"] = int(batch_id)

    _drive(spark, deltas_dir, state_dir, fold,
           max_files_per_trigger=max_files_per_trigger)
    final = holder["prev"]
    if final is None:
        return spark.createDataFrame(
            [], "id long, triangles long, coefficient double")
    return final.select("id", "triangles", "coefficient")


def run_labelprop_maintenance(
    spark: SparkSession,
    deltas_dir: str,
    state_dir: str,
    *,
    max_iterations: int = 10,
    direction: str = "out",
    relabel_every: int = 1,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Maintain LPA community labels over streamed edge deltas; returns
    the final (id, label). Each fold appends the delta to the
    accumulated edge store and re-runs synchronous LPA WARM-STARTED
    from the previous labels (they ride in as the reference's seed
    ``partition`` property — LabelPropagation.java reads seeds the same
    way), so a small crawl delta converges in the perturbation-decay
    rounds instead of from singleton labels. New vertices default to
    their own id, exactly the cold-start rule. ``relabel_every=k``
    ingests edges every batch but refreshes labels on every k-th (the
    same cadence knob as PageRank maintenance). Idempotent per batch id
    via the committed-iteration guard; LPA itself is a fixpoint
    refinement, so a replayed relabel reproduces the same state."""
    from ..operators.labelprop import label_propagation

    edges_store = os.path.join(state_dir, "edges")
    mgr = CheckpointManager(spark, checkpoint_dir=os.path.join(
        state_dir, "lpa_state"), interval=1, algorithm="labelprop_stream")
    resumed = mgr.resume()
    holder: dict[str, Any] = {
        "prev": resumed[1] if resumed else None,
        "committed": resumed[0] if resumed else -1,
        "since": 0,
    }

    def relabel(batch_id: int, n_delta: int) -> None:
        edges = (
            spark.read.parquet(edges_store)
            .select("src", "dst").dropDuplicates(["src", "dst"])
        )
        v = _vertices(edges)
        prev = holder["prev"]
        if prev is not None:
            v = v.join(
                prev.select("id", F.col("label").alias("partition")),
                "id", "left")
        res = label_propagation(
            v, edges, max_iterations=max_iterations, direction=direction,
            partition_col="partition" if prev is not None else None,
            node_weight_col=None)
        state, _ = mgr.maybe_checkpoint(
            res.labels.select("id", "label"), int(batch_id),
            delta_edges=n_delta, rounds=res.ran_iterations)
        holder["prev"] = state
        holder["committed"] = int(batch_id)

    def fold(batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= holder["committed"]:
            return  # crash-replayed batch: state already reflects it
        delta = batch.select("src", "dst").dropDuplicates(["src", "dst"])
        n_delta = delta.count()
        delta.write.mode("overwrite").parquet(
            os.path.join(edges_store, f"batch={int(batch_id)}"))
        holder["last_batch"] = int(batch_id)
        holder["since"] += 1
        if holder["since"] >= relabel_every:
            relabel(int(batch_id), n_delta)
            holder["since"] = 0

    _drive(spark, deltas_dir, state_dir, fold,
           max_files_per_trigger=max_files_per_trigger)
    if holder["since"] > 0 and os.path.exists(edges_store):
        relabel(holder["last_batch"], 0)  # trailing partial window
    final = holder["prev"]
    if final is None:
        return spark.createDataFrame([], "id long, label long")
    return final.select("id", "label")
