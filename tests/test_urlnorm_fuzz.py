"""Property fuzz for canonicalize_url: idempotence and totality on
arbitrary URL-ish strings (hypothesis drives the generator; one Spark
batch per example set keeps the JVM round-trips bounded)."""

from hypothesis import given, settings, strategies as st

from neo4j_graph_algorithms_spark.pipeline.urlnorm import canonicalize_url

_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"])
_host = st.text(
    alphabet="abcDEF019.-", min_size=1, max_size=12)
_port = st.sampled_from(["", ":80", ":443", ":8080", ":0007"])
_path = st.text(alphabet="/aZ9._~%-", max_size=12)
_query = st.sampled_from(
    ["", "?b=2&a=1", "?utm_source=x", "?a=1&a=1&&z", "?=", "?a"])
_frag = st.sampled_from(["", "#f", "#a#b", "#"])

_url = st.builds(
    lambda s, h, po, pa, q, f: f"{s}://{h}{po}{pa}{q}{f}",
    _scheme, _host, _port, _path, _query, _frag)
_junk = st.text(max_size=20)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(_url, _junk), min_size=1, max_size=20))
def test_idempotent_and_total(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [r.c for r in
            df.select(canonicalize_url("url").alias("c")).collect()]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [r.c for r in
             df2.select(canonicalize_url("url").alias("c")).collect()]
    assert once == twice
    assert all(c is not None for c in once)


@settings(max_examples=20, deadline=None)
@given(_url)
def test_variants_collapse(spark, url):
    """Adding a fragment or explicit default port to an already-
    canonical URL must not change its canonical form."""
    df = spark.createDataFrame([(url,)], "url string")
    canon = df.select(canonicalize_url("url").alias("c")).collect()[0].c
    if "://" not in canon:
        return  # junk passthrough
    variants = [canon + "#frag"]
    df2 = spark.createDataFrame([(v,) for v in variants], "url string")
    got = [r.c for r in
           df2.select(canonicalize_url("url").alias("c")).collect()]
    assert all(g == canon for g in got)
