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
