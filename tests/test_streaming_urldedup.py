"""Streaming canonical-URL dedup maintenance (streaming/dedup.py)."""

import os

from neo4j_graph_algorithms_spark.streaming.dedup import (
    run_url_dedup_maintenance,
)


def _stamp(fp, i):
    t = 1_700_000_000 + i * 60
    os.utime(fp, (t, t))


def _write_page_batches(pages_dir, batches):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(pages_dir, exist_ok=True)
    for i, b in enumerate(batches):
        tbl = pa.table({
            "url": [u for u, _, _ in b],
            "capture_ts": [int(t) for _, t, _ in b],
            "doc_id": [int(d) for _, _, d in b],
        })
        fp = os.path.join(pages_dir, f"drop{i:03d}.parquet")
        pq.write_table(tbl, fp)
        _stamp(fp, i)


def _batch_want(spark, batches):
    from neo4j_graph_algorithms_spark.pipeline.urlnorm import url_dedup

    rows = [r for b in batches for r in b]
    df = spark.createDataFrame(
        rows, "url string, capture_ts long, doc_id long")
    return {
        (r.canonical_url, r.capture_ts, r.url, r.doc_id, r.n_variants)
        for r in url_dedup(df, ts_col="capture_ts",
                           id_col="doc_id").collect()
    }


BATCHES = [
    [("https://E.org/a/?utm_source=x", 10, 0),
     ("https://e.org/b", 5, 1)],
    [("https://e.org:443/a/", 30, 2),
     ("https://e.org/b#frag", 50, 3)],
    [("https://e.org/a", 20, 4)],
]


def test_matches_batch_url_dedup(spark, tmp_path):
    pages = str(tmp_path / "pages")
    _write_page_batches(pages, BATCHES)
    got = {
        (r.canonical_url, r.capture_ts, r.url, r.doc_id, r.n_variants)
        for r in run_url_dedup_maintenance(
            spark, pages, str(tmp_path / "state")).collect()
    }
    assert got == _batch_want(spark, BATCHES)
    # latest capture won, not latest arrival: doc 2 (ts 30) beats
    # doc 4 (ts 20) even though doc 4 arrived later
    winners = {r[0]: r[3] for r in got}
    assert winners["https://e.org/a"] == 2


def test_drop_order_independent(spark, tmp_path):
    """Latest-wins is a commutative merge — shuffled drops give the
    identical registry (contrast: exact-dedup is first-seen)."""
    shuffled = [BATCHES[2], BATCHES[0], BATCHES[1]]
    pages = str(tmp_path / "pages")
    _write_page_batches(pages, shuffled)
    got = {
        (r.canonical_url, r.capture_ts, r.url, r.doc_id, r.n_variants)
        for r in run_url_dedup_maintenance(
            spark, pages, str(tmp_path / "state")).collect()
    }
    assert got == _batch_want(spark, BATCHES)


def test_restart_resumes_and_folds_new_drop(spark, tmp_path):
    pages = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    _write_page_batches(pages, BATCHES)
    first = run_url_dedup_maintenance(spark, pages, state).collect()
    assert len(first) == 2
    extra = [("https://e.org/a?x=1", 99, 9)]
    _write_page_batches(pages, BATCHES + [extra])
    got = {
        (r.canonical_url, r.capture_ts, r.url, r.doc_id, r.n_variants)
        for r in run_url_dedup_maintenance(spark, pages, state).collect()
    }
    assert got == _batch_want(spark, BATCHES + [extra])
    assert len(got) == 3


def test_cms_maintenance_counter_exact_any_order(spark, tmp_path):
    """CMS counters are an addition-monoid: the streamed table equals
    the batch union sketch COUNTER-EXACTLY, in any drop order."""
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from neo4j_graph_algorithms_spark.pipeline.cms import cms_build
    from neo4j_graph_algorithms_spark.pipeline.dedup import tokens_expr
    from neo4j_graph_algorithms_spark.streaming.dedup import (
        run_cms_maintenance,
    )

    batches = [
        [(i, f"tok{i % 7} common word{i % 3}") for i in range(0, 30)],
        [(i, f"tok{i % 7} rare{i}") for i in range(30, 50)],
        [(i, "common common burst") for i in range(50, 60)],
    ]

    def write(docs_dir, bs):
        _os.makedirs(docs_dir, exist_ok=True)
        for i, rows in enumerate(bs):
            tbl = pa.table({
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["s"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            })
            fp = _os.path.join(docs_dir, f"drop{i:03d}.parquet")
            pq.write_table(tbl, fp)
            _stamp(fp, i)

    all_rows = [r for b in batches for r in b]
    want_df = spark.createDataFrame(all_rows, "doc_id long, text string")
    want_toks = want_df.select(
        F.explode(tokens_expr(F.col("text"))).alias("tok"))
    want = sorted(tuple(r) for r in
                  cms_build(want_toks, "tok", depth=3, width=64).collect())
    for perm, tag in ((batches, "fwd"), (batches[::-1], "rev")):
        docs = str(tmp_path / f"cms_docs_{tag}")
        write(docs, perm)
        got = sorted(tuple(r) for r in
                     run_cms_maintenance(
                         spark, docs, str(tmp_path / f"cms_state_{tag}"),
                         depth=3, width=64).collect())
        assert got == want


def test_cms_maintenance_empty_stream(spark, tmp_path):
    from neo4j_graph_algorithms_spark.streaming.dedup import (
        run_cms_maintenance,
    )

    docs = str(tmp_path / "cms_empty")
    os.makedirs(docs)
    out = run_cms_maintenance(spark, docs, str(tmp_path / "cms_est"))
    assert out.count() == 0
    assert out.columns == ["d", "idx", "cnt"]


def test_empty_stream(spark, tmp_path):
    pages = str(tmp_path / "pages")
    os.makedirs(pages)
    out = run_url_dedup_maintenance(spark, pages, str(tmp_path / "state"))
    assert out.count() == 0
    assert out.columns == ["canonical_url", "capture_ts", "url",
                           "doc_id", "n_variants"]


def test_sketch_maintenance_register_exact_any_order(spark, tmp_path):
    """HLL registers are a max-monoid: the streamed registry equals
    the batch union sketch REGISTER-EXACTLY, in any drop order."""
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from neo4j_graph_algorithms_spark.pipeline.sketches import (
        hll_group_sketches,
    )
    from neo4j_graph_algorithms_spark.streaming.dedup import (
        run_sketch_maintenance,
    )

    batches = [
        [(i, f"text-{i % 37}", "en", f"s{i % 2}") for i in range(0, 40)],
        [(i, f"text-{i % 37}", "en", f"s{i % 2}") for i in range(40, 70)],
        [(i, f"other-{i}", "en", f"s{i % 2}") for i in range(70, 90)],
    ]

    def write(docs_dir, bs):
        _os.makedirs(docs_dir, exist_ok=True)
        for i, rows in enumerate(bs):
            tbl = pa.table({
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": [r[3] for r in rows],
                "n_chars": [len(r[1]) for r in rows],
            })
            fp = _os.path.join(docs_dir, f"drop{i:03d}.parquet")
            pq.write_table(tbl, fp)
            _stamp(fp, i)

    all_rows = [r for b in batches for r in b]
    want_df = spark.createDataFrame(
        all_rows, "doc_id long, text string, lang string, source string")
    want = sorted(tuple(r) for r in
                  hll_group_sketches(want_df, ["source"], "text", b=4)
                  .collect())
    for perm, tag in ((batches, "fwd"), (batches[::-1], "rev")):
        docs = str(tmp_path / f"docs_{tag}")
        write(docs, perm)
        got = sorted(tuple(r) for r in
                     run_sketch_maintenance(
                         spark, docs, str(tmp_path / f"state_{tag}"),
                         keys=["source"], b=4).collect())
        assert got == want
