"""WARC source: synthesized segments round-trip into the pages schema."""

import gzip

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_pages,
)


def _http(body: bytes, status: str = "200 OK",
          ctype: str = "text/html") -> bytes:
    return (f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
            .encode() + body)


def _record(rtype: str, url: str, ts: str, payload: bytes) -> bytes:
    head = (f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {url}\r\nWARC-Date: {ts}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return head + payload + b"\r\n\r\n"


HTML_A = b"<html><p>hello world</p><a href=\"http://b.test/\">b</a></html>"
HTML_B = b"<html><p>the quick brown fox and the lazy dog</p></html>"


def _segment() -> bytes:
    return (
        _record("warcinfo", "", "2026-08-19T00:00:00Z", b"software: test")
        + _record("request", "http://a.test/", "2026-08-19T01:02:03Z",
                  b"GET / HTTP/1.1\r\nHost: a.test\r\n\r\n")
        + _record("response", "http://a.test/", "2026-08-19T01:02:03Z",
                  _http(HTML_A))
        + _record("response", "http://gone.test/", "2026-08-19T01:02:04Z",
                  _http(b"nope", status="404 Not Found"))
        + _record("response", "http://b.test/", "2026-08-19T01:02:05Z",
                  _http(HTML_B))
    )


def test_parse_warc_bytes_filters_and_roundtrips():
    recs = list(parse_warc_bytes(_segment()))
    assert [r["url"] for r in recs] == ["http://a.test/", "http://b.test/"]
    assert recs[0]["html"] == HTML_A
    assert recs[1]["html"] == HTML_B
    assert recs[0]["content_type"] == "text/html"
    assert recs[0]["warc_ts"].isoformat() == "2026-08-19T01:02:03+00:00"


def test_parse_warc_gzip_members_and_truncation():
    # one gzip member per record (the Common Crawl layout) + a
    # truncated trailing record that must be dropped, not crash
    plain = _segment()
    members = b"".join(
        gzip.compress(_record("response", f"http://m{i}.test/",
                              "2026-08-19T02:00:00Z", _http(HTML_A)))
        for i in range(3))
    recs = list(parse_warc_bytes(members))
    assert [r["url"] for r in recs] == [
        "http://m0.test/", "http://m1.test/", "http://m2.test/"]
    truncated = plain[:-40]
    recs2 = list(parse_warc_bytes(truncated))
    assert [r["url"] for r in recs2] == ["http://a.test/"] or \
        [r["url"] for r in recs2] == ["http://a.test/", "http://b.test/"]


def test_read_warc_dataframe(spark, tmp_path):
    (tmp_path / "seg0.warc").write_bytes(_segment())
    (tmp_path / "seg1.warc.gz").write_bytes(gzip.compress(_segment()))
    df = read_warc(spark, str(tmp_path))
    rows = {(r["url"], bytes(r["html"])) for r in df.collect()}
    assert rows == {("http://a.test/", HTML_A), ("http://b.test/", HTML_B)} \
        or len(rows) == 2  # same two pages from both segments, deduped set
    assert df.count() == 4  # 2 response-200 records x 2 segments


def test_warc_pages_schema_and_extraction(spark, tmp_path):
    (tmp_path / "seg0.warc").write_bytes(_segment())
    pages = warc_pages(spark, str(tmp_path))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    got = {r["url"]: r for r in pages.collect()}
    assert got["http://a.test/"]["text"] == "hello world"
    assert got["http://b.test/"]["text"] == \
        "the quick brown fox and the lazy dog"
    assert got["http://b.test/"]["lang"] == "en"
    assert got["http://a.test/"]["warc_ts"] is not None


def test_parse_warc_fuzz_bodies_with_separator_bytes():
    """Content-Length framing must survive bodies containing CRLFCRLF
    and header-lookalike bytes — random bodies round-trip byte-exact."""
    import random

    rng = random.Random(13)
    alphabet = [b"\r\n\r\n", b"WARC/1.0\r\n", b"<p>x</p>", b"\x00\xff",
                b"Content-Length: 9\r\n", b"a" * 7]
    for trial in range(20):
        bodies = []
        seg = b""
        for i in range(rng.randrange(1, 6)):
            body = b"".join(rng.choice(alphabet)
                            for _ in range(rng.randrange(0, 12)))
            bodies.append(body)
            seg += _record("response", f"http://f{trial}-{i}.test/",
                           "2026-08-19T03:00:00Z", _http(body))
        recs = list(parse_warc_bytes(seg))
        assert [r["html"] for r in recs] == bodies
        assert [r["url"] for r in recs] == [
            f"http://f{trial}-{i}.test/" for i in range(len(bodies))]
