"""Streaming graph maintenance: foreachBatch folds of the incremental
operators must converge to the batch engine's answer on the union of all
deltas, survive restarts (stream + state checkpoints), and never
double-count replayed or re-discovered edges.
"""

import os

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
from neo4j_graph_algorithms_spark.operators.triangles import triangle_count
from neo4j_graph_algorithms_spark.operators.wcc import connected_components
from neo4j_graph_algorithms_spark.streaming.graph_maintenance import (
    run_component_maintenance,
    run_pagerank_maintenance,
    run_triangle_maintenance,
)

# three crawl drops over a 12-node graph; (3,4) appears in drops 1 AND 2
# (re-discovered edge) and drop 3 brings a component-merging bridge
BATCHES = [
    [(0, 1), (1, 2), (2, 0), (3, 4), (5, 6)],
    [(3, 4), (4, 5), (7, 8), (8, 9)],
    [(6, 7), (2, 3), (10, 11)],
]


def _union_edges(spark):
    rows = sorted({e for b in BATCHES for e in b})
    return spark.createDataFrame(
        [(s, d) for s, d in rows], "src long, dst long")


def _stamp_arrival_order(path, i):
    # Spark's file source orders same-mtime files ARBITRARILY (directory
    # listing order); real crawl drops arrive over time with increasing
    # mtimes. Space them 10 s apart so drop order == arrival order even
    # when a loaded test box writes all files within one mtime tick
    # (observed: a full-suite run processed drop001 before drop000 and
    # flipped a first-seen-wins survivor).
    base = 1_600_000_000
    os.utime(path, (base + 10 * i, base + 10 * i))


def _write_batches(spark, deltas_dir, batches):
    # one file per drop => one micro-batch per drop at maxFilesPerTrigger=1
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(deltas_dir, exist_ok=True)
    for i, b in enumerate(batches):
        tbl = pa.table({"src": [int(s) for s, _ in b],
                        "dst": [int(d) for _, d in b]})
        fp = os.path.join(deltas_dir, f"drop{i:03d}.parquet")
        pq.write_table(tbl, fp)
        _stamp_arrival_order(fp, i)


def _vertices(edges):
    return (edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id"))).distinct())


def test_component_maintenance_matches_batch(spark, tmp_path):
    deltas = str(tmp_path / "deltas")
    _write_batches(spark, deltas, BATCHES)
    got = run_component_maintenance(spark, deltas, str(tmp_path / "state"))
    e = _union_edges(spark)
    want = connected_components(_vertices(e), e).components
    assert {(r.id, r.component) for r in got.collect()} == \
        {(r.id, r.component) for r in want.collect()}


def test_component_maintenance_metrics_lineage(spark, tmp_path):
    import json

    deltas = str(tmp_path / "deltas")
    _write_batches(spark, deltas, BATCHES)
    run_component_maintenance(spark, deltas, str(tmp_path / "state"))
    mpath = tmp_path / "state" / "wcc_state" / "metrics.jsonl"
    rows = [json.loads(ln) for ln in open(mpath)]
    assert [r["batch_id"] for r in rows] == [0, 1, 2]
    assert all(r["checkpoint"] for r in rows)
    # drop 3's bridge (6,7)+(2,3) merges {0,1,2},{3,4,5,6},{7,8,9} into one
    assert rows[-1]["components"] == 2
    assert rows[-1]["vertices"] == 12


def test_component_maintenance_resume_across_runs(spark, tmp_path):
    deltas = str(tmp_path / "deltas")
    state = str(tmp_path / "state")
    _write_batches(spark, deltas, BATCHES[:2])
    run_component_maintenance(spark, deltas, state)
    # a later crawl drop lands; a NEW driver run resumes both checkpoints
    _write_batches(spark, deltas, BATCHES)  # rewrites 0,1 + adds drop 2
    got = run_component_maintenance(spark, deltas, state)
    e = _union_edges(spark)
    want = connected_components(_vertices(e), e).components
    assert {(r.id, r.component) for r in got.collect()} == \
        {(r.id, r.component) for r in want.collect()}


def test_pagerank_maintenance_matches_batch(spark, tmp_path):
    deltas = str(tmp_path / "deltas")
    _write_batches(spark, deltas, BATCHES)
    got = run_pagerank_maintenance(
        spark, deltas, str(tmp_path / "state"), tol=1e-9,
        max_iterations=200)
    e = _union_edges(spark)
    want = pagerank(_vertices(e), e, tol=1e-9, max_iterations=200).ranks
    g = {r.id: r.rank for r in got.collect()}
    w = {r.id: r.rank for r in want.collect()}
    assert set(g) == set(w)
    for vid in w:
        assert g[vid] == pytest.approx(w[vid], abs=1e-6), vid


def test_pagerank_maintenance_rerank_cadence(spark, tmp_path):
    import json

    deltas = str(tmp_path / "deltas")
    _write_batches(spark, deltas, BATCHES)
    got = run_pagerank_maintenance(
        spark, deltas, str(tmp_path / "state"), tol=1e-9,
        max_iterations=200, rerank_every=2)
    # 3 drops at cadence 2 => rank after drop 1 (batch id 1) + trailing
    mpath = tmp_path / "state" / "rank_state" / "metrics.jsonl"
    rows = [json.loads(ln) for ln in open(mpath)]
    assert len(rows) == 2
    e = _union_edges(spark)
    want = pagerank(_vertices(e), e, tol=1e-9, max_iterations=200).ranks
    w = {r.id: r.rank for r in want.collect()}
    g = {r.id: r.rank for r in got.collect()}
    for vid in w:
        assert g[vid] == pytest.approx(w[vid], abs=1e-6), vid


def test_triangle_maintenance_matches_batch(spark, tmp_path):
    # (3,4) repeats across drops and drop 3 closes triangles over old
    # edges — both the anti-join and the delta-wedge paths are exercised
    tri_batches = [
        [(0, 1), (1, 2), (3, 4)],
        [(2, 0), (3, 4), (4, 5)],
        [(3, 5), (0, 3)],
    ]
    deltas = str(tmp_path / "deltas")
    _write_batches(spark, deltas, tri_batches)
    got = run_triangle_maintenance(spark, deltas, str(tmp_path / "state"))
    rows = sorted({e for b in tri_batches for e in b})
    e = spark.createDataFrame(rows, "src long, dst long")
    want = triangle_count(_vertices(e), e).node_counts
    g = {(r.id, r.triangles, round(r.coefficient, 9)) for r in got.collect()}
    w = {(r.id, r.triangles, round(r.coefficient, 9)) for r in want.collect()}
    assert g == w


def test_empty_stream_returns_empty_state(spark, tmp_path):
    deltas = str(tmp_path / "deltas")
    os.makedirs(deltas)
    got = run_component_maintenance(spark, deltas, str(tmp_path / "state"))
    assert got.count() == 0
    assert got.columns == ["id", "component"]


# ---- streaming exact-dedup maintenance --------------------------------

def _write_doc_batches(docs_dir, batches):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(docs_dir, exist_ok=True)
    for i, b in enumerate(batches):
        tbl = pa.table({
            "doc_id": [int(d) for d, _ in b],
            "text": [t for _, t in b],
            "lang": ["en"] * len(b),
            "source": ["s"] * len(b),
            "n_chars": [len(t) for _, t in b],
        })
        fp = os.path.join(docs_dir, f"drop{i:03d}.parquet")
        pq.write_table(tbl, fp)
        _stamp_arrival_order(fp, i)


def test_dedup_maintenance_matches_batch(spark, tmp_path):
    """doc_id-ordered drops: the streaming registry equals batch
    exact_duplicates' global min_doc_id survivors."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import exact_duplicates
    from neo4j_graph_algorithms_spark.streaming.dedup import (
        run_dedup_maintenance,
    )

    batches = [
        [(0, "alpha"), (1, "beta"), (2, "alpha")],
        [(3, "gamma"), (4, "beta"), (5, "delta")],
        [(6, "alpha"), (7, "epsilon")],
    ]
    docs = str(tmp_path / "docs")
    _write_doc_batches(docs, batches)
    got = {(r["fingerprint"], r["survivor_doc_id"]) for r in
           run_dedup_maintenance(spark, docs, str(tmp_path / "state"))
           .collect()}
    all_rows = [(d, t, "en", "s", len(t)) for b in batches for d, t in b]
    df = spark.createDataFrame(
        all_rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
    want = {(r["fingerprint"], r["min_doc_id"]) for r in
            exact_duplicates(df).collect()}
    assert got == want and len(got) == 5


def test_dedup_maintenance_first_seen_and_restart(spark, tmp_path):
    """Out-of-order drop: the registry keeps the FIRST-SEEN owner, and
    a restarted run resumes from state without refolding."""
    from neo4j_graph_algorithms_spark.streaming.dedup import (
        run_dedup_maintenance,
    )

    docs = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    # doc 10 registers "zeta" first; doc 3 (smaller id) arrives later
    _write_doc_batches(docs, [[(10, "zeta")], [(3, "zeta"), (4, "eta")]])
    got = {(r["fingerprint"], r["survivor_doc_id"]) for r in
           run_dedup_maintenance(spark, docs, state).collect()}
    owners = dict(got)
    import hashlib
    zeta = hashlib.md5(b"zeta").hexdigest()
    assert owners[zeta] == 10  # first seen, NOT min doc id
    # restart with one more drop: old state survives, new doc folds in
    _write_doc_batches(docs, [[(10, "zeta")], [(3, "zeta"), (4, "eta")],
                              [(20, "theta")]])
    got2 = dict(
        (r["fingerprint"], r["survivor_doc_id"]) for r in
        run_dedup_maintenance(spark, docs, state).collect())
    assert got2[zeta] == 10 and len(got2) == 3


def test_near_dup_maintenance_matches_batch(spark, tmp_path):
    """Accumulated streaming LSH pairs equal batch
    minhash_lsh_candidates over the whole corpus — including a pair
    whose two docs arrive in DIFFERENT drops (the posting-store cross
    join) and a replayed-safe restart."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        minhash_lsh_candidates,
    )
    from neo4j_graph_algorithms_spark.streaming.dedup import (
        run_near_dup_maintenance,
    )

    batches = [
        [(0, "red fox jumps"), (1, "red fox jumps"), (2, "blue whale")],
        [(3, "red fox jumps"), (4, "green tree")],
        [(5, "blue whale"), (6, "lone document here")],
    ]
    docs = str(tmp_path / "docs")
    _write_doc_batches(docs, batches)
    got = {(r["doc_a"], r["doc_b"]) for r in
           run_near_dup_maintenance(
               spark, docs, str(tmp_path / "state"),
               n_hashes=4, bands=2).collect()}
    all_rows = [(d, t, "en", "s", len(t)) for b in batches for d, t in b]
    df = spark.createDataFrame(
        all_rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
    want = {(r["doc_a"], r["doc_b"]) for r in
            minhash_lsh_candidates(df, n_hashes=4, bands=2).collect()}
    assert got == want
    # cross-batch pairs present: (0,3) and (2,5) span drops
    assert (0, 3) in got and (2, 5) in got
    # restart on the same state dir: no new drops -> same final state
    again = {(r["doc_a"], r["doc_b"]) for r in
             run_near_dup_maintenance(
                 spark, docs, str(tmp_path / "state"),
                 n_hashes=4, bands=2).collect()}
    assert again == got


def test_labelprop_maintenance_converges_and_is_fixpoint(spark, tmp_path):
    from neo4j_graph_algorithms_spark.streaming.graph_maintenance import (
        run_labelprop_maintenance,
    )

    # two cliques arriving in separate drops, bridged by nothing
    cliq_a = [(a, b) for a in (0, 1, 2, 3) for b in (0, 1, 2, 3) if a < b]
    cliq_b = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13)
              if a < b]
    deltas = str(tmp_path / "deltas")
    _write_batches(spark, deltas, [cliq_a, cliq_b])
    state = str(tmp_path / "state")
    # direction="out" on the a<b-oriented cliques: sync LPA funnels every
    # clique to its sink's label ("both" on K4 oscillates into a 2-2
    # split — the known synchronous-LPA bipartite oscillation)
    got = {r["id"]: r["label"] for r in run_labelprop_maintenance(
        spark, deltas, state, direction="out").collect()}
    assert set(got) == {0, 1, 2, 3, 10, 11, 12, 13}
    assert len({got[i] for i in (0, 1, 2, 3)}) == 1
    assert len({got[i] for i in (10, 11, 12, 13)}) == 1
    assert got[0] != got[10]

    # replaying the same drops into the same state is a no-op fixpoint
    # (committed-batch guard + warm-started LPA on an unchanged graph)
    again = {r["id"]: r["label"] for r in run_labelprop_maintenance(
        spark, deltas, state, direction="out").collect()}
    assert again == got


def test_labelprop_maintenance_resume_and_new_drop(spark, tmp_path):
    from neo4j_graph_algorithms_spark.streaming.graph_maintenance import (
        run_labelprop_maintenance,
    )

    cliq_a = [(a, b) for a in (0, 1, 2, 3) for b in (0, 1, 2, 3) if a < b]
    cliq_b = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13)
              if a < b]
    bridge = [(3, 10), (10, 3), (2, 11), (11, 2), (1, 12), (12, 1),
              (0, 13), (13, 0)]
    deltas = str(tmp_path / "deltas")
    state = str(tmp_path / "state")
    _write_batches(spark, deltas, [cliq_a, cliq_b])
    run_labelprop_maintenance(spark, deltas, state, direction="both")
    # a heavy bridge drop lands; a NEW run resumes state and re-labels
    _write_batches(spark, deltas, [cliq_a, cliq_b, bridge])
    got = {r["id"]: r["label"] for r in run_labelprop_maintenance(
        spark, deltas, state, direction="both").collect()}
    assert set(got) == {0, 1, 2, 3, 10, 11, 12, 13}
