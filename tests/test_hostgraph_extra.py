"""Mirror-host detection + crawl frontier (operators/hostgraph.py)."""

from neo4j_graph_algorithms_spark.operators.hostgraph import (
    crawl_frontier,
    mirror_hosts,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_mirror_pair_detected(spark):
    pages = _pages(spark, [
        ("https://a.org/1", "page one"),
        ("https://a.org/2", "page two"),
        ("https://a.org/3", "only on a"),
        ("https://b.org/x", "page one"),
        ("https://b.org/y", "page two"),
        ("https://c.org/z", "unrelated"),
    ])
    out = mirror_hosts(pages, min_shared=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.host_a, r.host_b) == ("a.org", "b.org")
    assert r.shared == 2
    # |A|=3, |B|=2, shared=2 -> 2/(3+2-2)
    assert abs(r.resemblance - 2 / 3) < 1e-6


def test_mirror_min_shared_and_duplicate_urls(spark):
    # same fingerprint twice on one host counts ONCE (distinct set)
    pages = _pages(spark, [
        ("https://a.org/1", "same"),
        ("https://a.org/2", "same"),
        ("https://b.org/1", "same"),
    ])
    assert mirror_hosts(pages, min_shared=2).count() == 0
    out = mirror_hosts(pages, min_shared=1).collect()
    assert out[0].shared == 1 and abs(out[0].resemblance - 1.0) < 1e-6


def test_mirror_hot_fingerprint_pruned(spark):
    # an "empty page" shared by many hosts must not pair everyone
    rows = [(f"https://h{i}.org/e", "") for i in range(6)]
    rows += [("https://h0.org/u", "real"), ("https://h1.org/u", "real")]
    out = mirror_hosts(_pages(spark, rows), min_shared=1, df_cutoff=5)
    got = [(r.host_a, r.host_b, r.shared) for r in out.collect()]
    assert got == [("h0.org", "h1.org", 1)]


def test_crawl_frontier(spark):
    edges = spark.createDataFrame([
        ("https://a.org/p", "https://new.org/x"),
        ("https://a.org/q", "https://new.org/x"),
        ("https://a.org/p", "https://new.org/x"),   # duplicate edge
        ("https://b.org/p", "https://new.org/x"),
        ("https://a.org/p", "https://a.org/q"),     # already crawled
    ], "src_url string, dst_url string")
    crawled = spark.createDataFrame(
        [("https://a.org/p",), ("https://a.org/q",), ("https://b.org/p",)],
        "url string")
    out = crawl_frontier(edges, crawled).collect()
    assert len(out) == 1
    r = out[0]
    assert r.url == "https://new.org/x"
    assert r.n_inlinks == 3      # distinct (src,dst) edges
    assert r.n_src_hosts == 2    # a.org + b.org
