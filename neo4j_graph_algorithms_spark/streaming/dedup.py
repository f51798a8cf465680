"""Continuously-maintained exact deduplication over a document stream.

A crawl drops document batches continuously; recomputing corpus-level
dedup per drop re-reads everything. This module keeps a durable
fingerprint registry (``fingerprint → survivor doc_id``) and folds each
micro-batch in with ONE fingerprint-keyed anti-join — the historical
corpus is never re-read, only the registry (one row per DISTINCT
document) is touched. Same ``foreachBatch`` + CheckpointManager commit
protocol as :mod:`.graph_maintenance`: parquet state + metrics line per
batch, crash-replayed batch ids skipped, so the fold is exactly-once in
effect and restartable from ``state_dir``.

Semantics: FIRST-SEEN WINS (the streaming convention, what Spark's own
``dropDuplicates`` does) — within a batch the smallest doc_id survives;
across batches an already-registered fingerprint never changes owner.
When batches arrive in doc_id order (the normal crawl append), this
equals batch-mode ``exact_duplicates``'s global min_doc_id exactly —
pytest pins both the equality and the out-of-order first-seen case.

Scale shape per micro-batch: a batch-sized hash aggregation (fingerprint
→ min doc_id), one anti-join against the registry keyed on fingerprint,
and a registry append. At 10^12 documents the registry is the big side;
production lays it out bucketed by fingerprint (sources/bucketed.py) so
the per-batch anti-join is exchange-free on the state side.

The reference has no streaming or dedup surface (graphs load once into
the JVM heap); this extends the engine's pipeline mandate the same way
streaming graph maintenance extends its graph mandate.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.checkpoint import CheckpointManager
from .graph_maintenance import _drive

__all__ = ["DOC_SCHEMA", "PAGE_SCHEMA", "run_dedup_maintenance",
           "run_near_dup_maintenance", "run_url_dedup_maintenance",
           "run_sketch_maintenance"]

DOC_SCHEMA = ("doc_id long, text string, lang string, source string, "
              "n_chars long")
PAGE_SCHEMA = "url string, capture_ts long, doc_id long"


def run_dedup_maintenance(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    *,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Fold streamed document batches into the durable fingerprint
    registry; returns the final ``(fingerprint, survivor_doc_id)``.

    Restartable: the stream position (``checkpointLocation``) and the
    registry both resume from ``state_dir``; a crash-replayed batch id
    is skipped before touching state.
    """
    mgr = CheckpointManager(spark, checkpoint_dir=os.path.join(
        state_dir, "dedup_state"), interval=1, algorithm="dedup_stream")
    resumed = mgr.resume()
    holder: dict[str, Any] = {
        "state": resumed[1] if resumed else None,
        "committed": resumed[0] if resumed else -1,
    }

    def fold(batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= holder["committed"]:
            return  # crash-replayed batch: state already reflects it
        cand = (
            batch.select(F.md5("text").alias("fingerprint"), "doc_id")
            .groupBy("fingerprint")
            .agg(F.min("doc_id").alias("survivor_doc_id"))
        )
        n_batch = batch.count()
        state = holder["state"]
        if state is not None:
            fresh = cand.join(
                state.select("fingerprint"), "fingerprint", "left_anti")
            new_state = state.unionByName(fresh)
        else:
            fresh = cand
            new_state = cand

        def action(st: DataFrame) -> dict[str, Any]:
            return {
                "registry_size": st.count(),
                "batch_docs": n_batch,
                "batch_new": fresh.count(),
                "batch_id": int(batch_id),
            }

        st, _ = mgr.maybe_checkpoint(new_state, int(batch_id), action=action)
        holder["state"] = st
        holder["committed"] = int(batch_id)

    _drive(spark, docs_dir, state_dir, fold,
           max_files_per_trigger=max_files_per_trigger,
           schema=DOC_SCHEMA)
    final = holder["state"]
    if final is None:  # empty stream
        return spark.createDataFrame(
            [], "fingerprint string, survivor_doc_id long")
    return final.select("fingerprint", "survivor_doc_id")


def run_near_dup_maintenance(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    *,
    n_hashes: int = 4,
    bands: int = 2,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Continuously-maintained MinHash-LSH near-dup candidates over a
    document stream; returns the final ``(doc_a, doc_b)`` pair set.

    Per micro-batch: compute the batch's band postings (a per-doc
    function of the text — batch postings equal whole-corpus postings),
    pair them against the durable POSTING STORE on (band, bkey) for
    cross-batch candidates, self-join within the batch for intra-batch
    candidates, append the batch's postings to the store, and fold the
    pairs into the checkpointed state. Because LSH candidacy is "shares
    ≥1 (band, bkey)", intra-batch ∪ cross-batch pairs accumulated over
    any drop order equals batch-mode
    :func:`~neo4j_graph_algorithms_spark.pipeline.dedup.minhash_lsh_candidates`
    on the full corpus — the driver oracle replays exactly that.

    Scale shape per batch: one batch-sized signature aggregation, one
    (band, bkey)-keyed join against the store (production lays the
    store out bucketed on the band key — sources/bucketed.py — so the
    state side is exchange-free), one pair union + dedup against the
    pair state. Crash-replay safe the same way as
    :func:`run_dedup_maintenance` (committed-batch-id guard; the store
    write excludes the replayed batch's own partition from the old
    side)."""
    from ..pipeline.dedup import band_postings

    posting_store = os.path.join(state_dir, "postings")
    mgr = CheckpointManager(spark, checkpoint_dir=os.path.join(
        state_dir, "neardup_state"), interval=1,
        algorithm="neardup_stream")
    resumed = mgr.resume()
    holder: dict[str, Any] = {
        "pairs": resumed[1] if resumed else None,
        "committed": resumed[0] if resumed else -1,
    }

    def fold(batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= holder["committed"]:
            return  # crash-replayed batch: state already reflects it
        post = band_postings(batch, n_hashes=n_hashes, bands=bands) \
            .localCheckpoint(eager=True)
        a = post.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
        b = post.select(F.col("doc_id").alias("doc_b"), "band", "bkey")
        new_pairs = (
            a.join(b, ["band", "bkey"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        if os.path.exists(posting_store):
            old = (
                spark.read.parquet(posting_store)
                .filter(F.col("batch") != int(batch_id))
                .select("doc_id", "band", "bkey")
            )
            cross = (
                post.join(old.withColumnRenamed("doc_id", "doc_o"),
                          ["band", "bkey"])
                .select(F.least("doc_id", "doc_o").alias("doc_a"),
                        F.greatest("doc_id", "doc_o").alias("doc_b"))
                .filter(F.col("doc_a") != F.col("doc_b"))
            )
            new_pairs = new_pairs.unionByName(cross)
        pairs = holder["pairs"]
        state = (new_pairs if pairs is None
                 else pairs.unionByName(new_pairs))
        state = state.dropDuplicates(["doc_a", "doc_b"])
        n_batch = post.count()
        # store first: if the state commit crashes, the replay guard
        # skips this batch and the excluded-own-partition read keeps
        # the already-stored postings out of the old side
        post.write.mode("overwrite").parquet(
            os.path.join(posting_store, f"batch={int(batch_id)}"))

        def action(st: DataFrame) -> dict[str, Any]:
            return {"pairs": st.count(), "batch_postings": n_batch,
                    "batch_id": int(batch_id)}

        st, _ = mgr.maybe_checkpoint(state, int(batch_id), action=action)
        holder["pairs"] = st
        holder["committed"] = int(batch_id)

    _drive(spark, docs_dir, state_dir, fold,
           max_files_per_trigger=max_files_per_trigger,
           schema=DOC_SCHEMA)
    final = holder["pairs"]
    if final is None:  # empty stream
        return spark.createDataFrame([], "doc_a long, doc_b long")
    return final.select("doc_a", "doc_b")


def run_url_dedup_maintenance(
    spark: SparkSession,
    pages_dir: str,
    state_dir: str,
    *,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Continuously-maintained canonical-URL dedup over a crawl stream;
    returns the final ``(canonical_url, capture_ts, url, doc_id,
    n_variants)`` — the latest capture per canonical URL (re-crawl
    semantics of :func:`~...pipeline.urlnorm.url_dedup`, maintained
    incrementally).

    Unlike the first-seen-wins fingerprint registry, latest-wins is a
    COMMUTATIVE merge: the winner is ``max(struct(capture_ts, url,
    doc_id))`` and the variant count a sum — both fold in any drop
    order, so the accumulated registry equals batch ``url_dedup`` on
    the union of drops regardless of arrival order (pytest pins the
    shuffled-drop case; contrast with exact-dedup's documented
    order-sensitivity).

    Scale shape per micro-batch: one batch-sized hash aggregation, one
    canonical-url-keyed outer join against the registry (bucketed state
    layout makes the registry side exchange-free — sources/bucketed.py),
    same CheckpointManager commit protocol as the other folds.
    """
    from ..pipeline.urlnorm import canonicalize_url

    mgr = CheckpointManager(spark, checkpoint_dir=os.path.join(
        state_dir, "urldedup_state"), interval=1,
        algorithm="urldedup_stream")
    resumed = mgr.resume()
    holder: dict[str, Any] = {
        "state": resumed[1] if resumed else None,
        "committed": resumed[0] if resumed else -1,
    }

    def fold(batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= holder["committed"]:
            return  # crash-replayed batch: state already reflects it
        cand = (
            batch.select(
                canonicalize_url("url").alias("canonical_url"),
                F.struct("capture_ts", "url", "doc_id").alias("_w"))
            .groupBy("canonical_url")
            .agg(F.max("_w").alias("_w"),
                 F.count(F.lit(1)).alias("n_variants"))
        )
        n_batch = batch.count()
        state = holder["state"]
        if state is not None:
            merged = (
                state.withColumnsRenamed(
                    {"_w": "_ws", "n_variants": "_ns"})
                .join(cand, "canonical_url", "full_outer")
                .select(
                    "canonical_url",
                    F.greatest("_ws", "_w").alias("_w"),
                    (F.coalesce("_ns", F.lit(0))
                     + F.coalesce("n_variants", F.lit(0)))
                    .alias("n_variants"),
                )
            )
        else:
            merged = cand

        def action(st: DataFrame) -> dict[str, Any]:
            return {"registry_size": st.count(), "batch_pages": n_batch,
                    "batch_id": int(batch_id)}

        st, _ = mgr.maybe_checkpoint(merged, int(batch_id), action=action)
        holder["state"] = st
        holder["committed"] = int(batch_id)

    _drive(spark, pages_dir, state_dir, fold,
           max_files_per_trigger=max_files_per_trigger,
           schema=PAGE_SCHEMA)
    final = holder["state"]
    if final is None:  # empty stream
        return spark.createDataFrame(
            [], "canonical_url string, capture_ts long, url string, "
                "doc_id long, n_variants long")
    return final.select(
        "canonical_url", F.col("_w.capture_ts").alias("capture_ts"),
        F.col("_w.url").alias("url"), F.col("_w.doc_id").alias("doc_id"),
        F.col("n_variants").cast("long").alias("n_variants"))


def run_sketch_maintenance(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    *,
    keys: list[str] | None = None,
    value_col: str = "text",
    b: int = 6,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Continuously-maintained per-key HLL distinct-count sketches
    (pipeline/sketches.py) over a document stream; returns the final
    register table ``(keys..., r0..r{m-1})``.

    HLL registers are a commutative monoid under elementwise max, so
    folding each micro-batch's group sketches into the durable table
    with :func:`~...pipeline.sketches.hll_merge_sketches` yields a
    registry REGISTER-EXACTLY equal to the batch sketch of the union,
    in any drop order (pytest pins shuffled drops + restart). The
    at-scale answer to "distinct URLs per host, updated per crawl
    drop" without recounting history.

    Per micro-batch: one batch-sized max aggregation + one keyed outer
    join against the |keys|-sized state. Same CheckpointManager commit
    protocol as the other folds.
    """
    from ..pipeline.sketches import hll_group_sketches, hll_merge_sketches

    keys = keys or ["source"]
    mgr = CheckpointManager(spark, checkpoint_dir=os.path.join(
        state_dir, "sketch_state"), interval=1,
        algorithm="sketch_stream")
    resumed = mgr.resume()
    holder: dict[str, Any] = {
        "state": resumed[1] if resumed else None,
        "committed": resumed[0] if resumed else -1,
    }

    def fold(batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= holder["committed"]:
            return  # crash-replayed batch: state already reflects it
        cand = hll_group_sketches(batch, keys, value_col, b=b)
        n_batch = batch.count()
        state = holder["state"]
        merged = (cand if state is None
                  else hll_merge_sketches(state, cand, keys, b=b))

        def action(st: DataFrame) -> dict[str, Any]:
            return {"sketch_keys": st.count(), "batch_docs": n_batch,
                    "batch_id": int(batch_id)}

        st, _ = mgr.maybe_checkpoint(merged, int(batch_id), action=action)
        holder["state"] = st
        holder["committed"] = int(batch_id)

    _drive(spark, docs_dir, state_dir, fold,
           max_files_per_trigger=max_files_per_trigger,
           schema=DOC_SCHEMA)
    final = holder["state"]
    if final is None:  # empty stream
        m = 1 << b
        cols = ", ".join(f"r{j} int" for j in range(m))
        return spark.createDataFrame(
            [], ", ".join(f"{k} string" for k in keys) + ", " + cols)
    return final


def run_cms_maintenance(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    *,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Continuously-maintained Count-Min token-frequency sketch
    (pipeline/cms.py) over a document stream; returns the final
    ``(d, idx, cnt)`` counter table.

    CMS counters are a commutative monoid under cell-wise ADDITION, so
    folding each micro-batch's sketch into the durable table with
    :func:`~...pipeline.cms.cms_merge` yields counters EXACTLY equal
    to the batch sketch of the union, in any drop order (pytest pins
    shuffled drops) — "how often is every token, updated per crawl
    drop" without recounting history, the frequency twin of the HLL
    registry above.

    Per micro-batch: one token expansion + one (d, idx)-keyed count
    aggregation (map-side combine), then one outer join against the
    ≤ D·W-row state. Same CheckpointManager commit protocol as the
    other folds.
    """
    from ..pipeline.cms import cms_build, cms_merge
    from ..pipeline.dedup import tokens_expr

    mgr = CheckpointManager(spark, checkpoint_dir=os.path.join(
        state_dir, "cms_state"), interval=1,
        algorithm="cms_stream")
    resumed = mgr.resume()
    holder: dict[str, Any] = {
        "state": resumed[1] if resumed else None,
        "committed": resumed[0] if resumed else -1,
    }

    def fold(batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= holder["committed"]:
            return  # crash-replayed batch: state already reflects it
        toks = batch.select(
            F.explode(tokens_expr(F.col(text_col))).alias("tok"))
        cand = cms_build(toks, "tok", depth=depth, width=width)
        n_batch = batch.count()
        state = holder["state"]
        merged = cand if state is None else cms_merge(state, cand)

        def action(st: DataFrame) -> dict[str, Any]:
            return {"cells": st.count(), "batch_docs": n_batch,
                    "batch_id": int(batch_id)}

        st, _ = mgr.maybe_checkpoint(merged, int(batch_id), action=action)
        holder["state"] = st
        holder["committed"] = int(batch_id)

    _drive(spark, docs_dir, state_dir, fold,
           max_files_per_trigger=max_files_per_trigger,
           schema=DOC_SCHEMA)
    final = holder["state"]
    if final is None:  # empty stream
        return spark.createDataFrame([], "d int, idx bigint, cnt bigint")
    return final
