"""Extraction correctness (FIXTURES.md §10 "pages-small"):
- extracted text byte-identical to the pages table's text column (the
  input_hint invariant),
- extracted edge list equals the generator's own link list exactly,
- URL normalization semantics."""

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.sources import (
    expected_edges,
    extract_edges,
    extract_text,
    generate_pages,
    normalize_url,
)

N = 300


def test_text_extraction_byte_identical(spark):
    pages = generate_pages(spark, N).persist()
    mismatches = (
        pages.select(
            "url",
            (extract_text(F.col("html")) == F.col("text")).alias("ok"),
        )
        .filter(~F.col("ok"))
        .count()
    )
    assert mismatches == 0
    # byte-level: compare utf-8 encodings too
    extracted = {
        r["url"]: r["ex"] for r in pages.select(
            "url", extract_text(F.col("html")).alias("ex")).collect()
    }
    golden = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    for url in golden:
        assert extracted[url].encode() == golden[url].encode()
    pages.unpersist()


def test_edge_extraction_matches_generator(spark):
    pages = generate_pages(spark, N)
    got = {
        (r["src_url"], r["dst_url"])
        for r in extract_edges(pages, dedup=True).collect()
    }
    exp_pdf = expected_edges(N)
    exp = set(zip(exp_pdf["src_url"], exp_pdf["dst_url"]))
    assert got == exp


def test_edge_extraction_no_dedup_preserves_duplicates(spark):
    pages = generate_pages(spark, N)
    n_raw = extract_edges(pages, dedup=False).count()
    assert n_raw == len(expected_edges(N))


def test_generator_deterministic_and_partition_independent(spark):
    a = generate_pages(spark, 50, num_partitions=2).orderBy("url").collect()
    b = generate_pages(spark, 50, num_partitions=7).orderBy("url").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_normalize_url(spark):
    df = spark.createDataFrame(
        [
            ("HTTPS://Example.ORG/Path/",),
            ("https://example.org/p/1#frag",),
            ("https://example.org/",),
            ("relative/path",),
        ],
        "u string",
    )
    got = [r["n"] for r in df.select(normalize_url(F.col("u")).alias("n")).collect()]
    assert got[0] == "https://example.org/Path"
    assert got[1] == "https://example.org/p/1"
    assert got[2] == "https://example.org/"
    assert got[3] == "relative/path"


def test_power_law_has_hubs(spark):
    # in-degree must be heavy-tailed (the skew the engine is built for)
    pages = generate_pages(spark, 500)
    indeg = (
        extract_edges(pages)
        .groupBy("dst_url").count().agg(F.max("count")).first()[0]
    )
    assert indeg > 20


# ---------------------------------------------------------------------------
# Multi-host generation + host-level rollup (operators/hostgraph.py)
# ---------------------------------------------------------------------------

from collections import Counter

from neo4j_graph_algorithms_spark.operators.hostgraph import (
    host_graph,
    url_host,
)


def _host_of(url: str) -> str:
    return url.split("://", 1)[1].split("/", 1)[0].lower()


def test_multihost_generator_and_extraction(spark):
    K = 8
    pages = generate_pages(spark, N, n_hosts=K)
    got = {
        (r["src_url"], r["dst_url"])
        for r in extract_edges(pages, dedup=True).collect()
    }
    exp_pdf = expected_edges(N, n_hosts=K)
    exp = set(zip(exp_pdf["src_url"], exp_pdf["dst_url"]))
    assert got == exp
    hosts = {_host_of(u) for u, _ in exp} | {_host_of(u) for _, u in exp}
    assert hosts == {f"h{i}.example.org" for i in range(K)}


def test_multihost_default_unchanged(spark):
    # n_hosts=1 must be byte-identical to the original single-host table
    a = generate_pages(spark, 40).orderBy("url").collect()
    b = generate_pages(spark, 40, n_hosts=1).orderBy("url").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_url_host_parsing(spark):
    rows = [
        ("https://EXAMPLE.org/p/1", "example.org"),
        ("http://user:pw@h3.example.org:8080/x?q=1#f", "h3.example.org"),
        ("ftp://files.example.org/pub", "files.example.org"),
        ("not a url", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = {r["url"]: r["h"] for r in
           df.select("url", url_host("url").alias("h")).collect()}
    for u, expect in rows:
        assert got[u] == expect, (u, got[u], expect)


def test_host_graph_rollup_vs_python_oracle(spark):
    K = 8
    exp_pdf = expected_edges(N, n_hosts=K).drop_duplicates()
    expected = Counter(
        (_host_of(s), _host_of(d))
        for s, d in zip(exp_pdf["src_url"], exp_pdf["dst_url"])
        if _host_of(s) != _host_of(d)
    )
    pages = generate_pages(spark, N, n_hosts=K)
    hg = host_graph(extract_edges(pages, dedup=True), drop_self_loops=True)
    got = {(r["src_host"], r["dst_host"]): r["weight"] for r in hg.collect()}
    assert got == dict(expected)
    # self-loop retention mode
    hg_all = host_graph(extract_edges(pages, dedup=True))
    total = sum(r["weight"] for r in hg_all.collect())
    assert total == len(exp_pdf)


def test_url_domain_and_domain_graph(spark):
    from neo4j_graph_algorithms_spark.operators.hostgraph import (
        domain_graph,
        url_domain,
    )

    rows = [
        ("https://a.b.example.co.uk/x", "example.co.uk"),
        ("https://h7.example.org/p/7", "example.org"),
        ("https://example.org/", "example.org"),
        ("https://user.github.io/repo", "user.github.io"),
        ("https://deep.sub.domain.example.com/", "example.com"),
        ("https://localhost/x", "localhost"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = {r["url"]: r["d"] for r in
           df.select("url", url_domain("url").alias("d")).collect()}
    for u, expect in rows:
        assert got[u] == expect, (u, got[u], expect)
    # rollup: multi-host synthetic pages collapse to ONE domain
    K = 4
    pages = generate_pages(spark, 60, n_hosts=K)
    dg = domain_graph(extract_edges(pages, dedup=True))
    out = dg.collect()
    assert len(out) == 1
    assert out[0]["src_domain"] == "example.org"


def test_with_registrable_domain_psl_table(spark):
    from neo4j_graph_algorithms_spark.operators.hostgraph import (
        with_registrable_domain,
    )

    psl = spark.createDataFrame(
        [("co.uk",), ("com.au",), ("github.io",), ("com",), ("org",),
         ("uk",), ("pvt.k12.ma.us",)],
        "suffix string",
    )
    rows = [
        # (url, expected registrable domain via the PSL table)
        ("https://a.b.example.co.uk/x", "example.co.uk"),
        ("https://shop.example.com.au/", "example.com.au"),
        ("https://user.github.io/repo", "user.github.io"),
        ("https://deep.sub.example.com/", "example.com"),
        # 4-label suffix match
        ("https://school.pvt.k12.ma.us/", "school.pvt.k12.ma.us"),
        # host IS a public suffix → maps to itself
        ("https://co.uk/", "co.uk"),
        # unknown suffix → implicit '*' rule (last two labels)
        ("https://a.b.example.zz/", "example.zz"),
        # single-label host, no match
        ("https://localhost/x", "localhost"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    out = with_registrable_domain(df, "url", suffixes=psl)
    got = {r["url"]: r["domain"] for r in out.collect()}
    for u, expect in rows:
        assert got[u] == expect, (u, got[u], expect)
    assert set(out.columns) == {"url", "domain"}  # helpers dropped
    # heuristic fallback path (no table) still works
    got2 = {
        r["url"]: r["domain"]
        for r in with_registrable_domain(df, "url").collect()
    }
    assert got2["https://a.b.example.co.uk/x"] == "example.co.uk"
    # the broadcast-join path must not shuffle the page side: every
    # join in the plan is a BroadcastHashJoin
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_anchor_stats_python_oracle(spark):
    """anchor_stats vs a plain-python rollup over the generator's
    expected link list (anchor text = 'link-{pos}')."""
    from collections import Counter, defaultdict

    from neo4j_graph_algorithms_spark.sources import (
        anchor_stats, generate_pages,
    )
    import numpy as np

    from neo4j_graph_algorithms_spark.sources.pages import (
        _out_degree, _targets_for, page_url,
    )

    n = 300
    pages = generate_pages(spark, n)
    got = {r["dst_url"]: r for r in anchor_stats(pages).collect()}

    per = defaultdict(Counter)
    idx = np.arange(n, dtype=np.int64)
    degs = _out_degree(idx, 42, 64)
    for i, deg in zip(idx.tolist(), degs.tolist()):
        for k, t in enumerate(_targets_for(i, deg, n, 42).tolist()):
            per[page_url(int(t))][f"link-{k}"] += 1
    assert set(got) == set(per)
    for dst, counts in per.items():
        r = got[dst]
        assert r["n_links"] == sum(counts.values()), dst
        assert r["n_distinct_anchors"] == len(counts), dst
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (r["top_anchor"], r["top_count"]) == best, dst
