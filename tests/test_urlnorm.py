"""URL canonicalization + canonical-URL dedup (pipeline/urlnorm.py)."""

import datetime

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.pipeline.urlnorm import (
    canonicalize_url,
    url_dedup,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in
            df.select(canonicalize_url("url").alias("c")).collect()]


def test_scheme_host_lowercase_fragment(spark):
    out = _canon(spark, [
        "HTTPS://Example.ORG/A/b#section-2",
        "http://example.org/x?a=1#frag",
    ])
    assert out == ["https://example.org/A/b", "http://example.org/x?a=1"]


def test_fragment_containing_question_mark_not_query(spark):
    # a '?' AFTER the '#' belongs to the fragment — it must not leak
    # into the canonical query (ADVICE r3: _QUERY_RE anchoring)
    out = _canon(spark, [
        "http://h.org/p#a?b=1",
        "http://h.org/p?x=2#a?b=1",
    ])
    assert out == ["http://h.org/p", "http://h.org/p?x=2"]


def test_default_port_dropped_other_kept(spark):
    out = _canon(spark, [
        "http://example.org:80/a",
        "https://example.org:443/a",
        "https://example.org:8443/a",
        "http://example.org:443/a",   # non-default for http — kept
    ])
    assert out == [
        "http://example.org/a",
        "https://example.org/a",
        "https://example.org:8443/a",
        "http://example.org:443/a",
    ]


def test_query_sorted_tracking_dropped(spark):
    out = _canon(spark, [
        "https://e.org/p?utm_source=tw&b=2&a=1",
        "https://e.org/p?a=1&b=2",
        "https://e.org/p?gclid=xyz&fbclid=1&ref=hn&utm_campaign",
        "https://e.org/p?refresh=1",  # 'refresh' is NOT 'ref'
    ])
    assert out[0] == out[1] == "https://e.org/p?a=1&b=2"
    assert out[2] == "https://e.org/p"
    assert out[3] == "https://e.org/p?refresh=1"


def test_path_normalization(spark):
    out = _canon(spark, [
        "https://e.org",          # empty path -> /
        "https://e.org/",
        "https://e.org/a/",
        "https://e.org/a///",
        "https://e.org/a/b",
    ])
    assert out == ["https://e.org/", "https://e.org/",
                   "https://e.org/a", "https://e.org/a",
                   "https://e.org/a/b"]


def test_unparseable_passthrough(spark):
    out = _canon(spark, ["not a url", "/relative/path", ""])
    assert out == ["not a url", "/relative/path", ""]


def test_idempotent(spark):
    urls = [
        "HTTPS://Example.ORG:443/A/b/?utm_source=x&z=1&a=2#f",
        "http://h.example.com:8080/p?b=1&a",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice


def test_url_dedup_latest_wins(spark):
    t = datetime.datetime
    rows = [
        # three spellings of the same page, increasing timestamps
        ("https://E.org/a/?utm_source=x", t(2020, 1, 1), "v1"),
        ("https://e.org/a", t(2020, 1, 3), "v3"),
        ("https://e.org:443/a/", t(2020, 1, 2), "v2"),
        # a different page
        ("https://e.org/b", t(2020, 1, 1), "only"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string")
    out = url_dedup(pages).orderBy("canonical_url").collect()
    assert [r.canonical_url for r in out] == [
        "https://e.org/a", "https://e.org/b"]
    assert out[0].text == "v3" and out[0].n_variants == 3
    assert out[1].text == "only" and out[1].n_variants == 1


def test_url_dedup_deterministic_tiebreak(spark):
    ts = datetime.datetime(2020, 1, 1)
    pages = spark.createDataFrame(
        [("https://e.org/a#x", ts, "frag-x"),
         ("https://e.org/a#y", ts, "frag-y")],
        "url string, warc_ts timestamp, text string")
    out = url_dedup(pages).collect()
    assert len(out) == 1
    # equal ts -> lexicographically largest raw url wins
    assert out[0].text == "frag-y"


def test_canonicalize_is_pure_expression(spark):
    """No Python in the plan: canonicalization must whole-stage-codegen
    (no BatchEvalPython / ArrowEvalPython nodes)."""
    df = spark.range(10).select(
        F.concat(F.lit("https://H.org/p/"), F.col("id")).alias("url"))
    plan = df.select(canonicalize_url("url").alias("c"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
