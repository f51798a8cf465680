"""WARC (Web ARChive, ISO 28500) reader — the real Common-Crawl
ingestion path.

The engine's pages schema ``(url, warc_ts, html, text, lang)`` mirrors
an Iceberg table derived from Common Crawl; this source closes the loop
by parsing raw WARC segments into that table. The reference has no file
ingestion at all (it reads a pre-loaded Neo4j store); a 10^12-document
corpus starts life as ~90k gzipped WARC files per crawl, so the
scan layer must read them directly.

Spark-first shape:

- ``spark.read.format("binaryFile")`` lists and reads the segment
  files — one task per file (WARC is a concatenated-record format;
  gzipped members are not block-splittable, and Common Crawl's ~1 GiB
  segment granularity IS the parallelism unit: 90k files saturate any
  executor count);
- record parsing runs inside ``mapInPandas`` (Arrow batches of file
  payloads in, Arrow batches of page rows out) — the same
  binary-column pattern as pipeline/multimodal.py, no per-row Python
  UDF in any hot column path;
- only ``WARC-Type: response`` records with an HTTP 200 status become
  pages; request/metadata/warcinfo records and non-200 responses are
  skipped (the Common Crawl convention).

Format notes (ISO 28500 §4): a record is a ``WARC/1.x`` header block,
CRLF CRLF, ``Content-Length`` payload octets, CRLF CRLF separator. For
response records the payload is an HTTP/1.x response message; the page
body follows the HTTP header block. Whole-file gzip (including
multi-member gzip, the Common Crawl layout — one member per record) is
transparently decompressed.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_warc", "warc_pages", "parse_warc_bytes"]

_PAGE_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "http_status int, content_type string")


def _gunzip_all(buf: bytes) -> bytes:
    """Decompress ALL gzip members (Common Crawl concatenates one per
    record); passthrough if not gzip."""
    if buf[:2] != b"\x1f\x8b":
        return buf
    out = io.BytesIO()
    stream = io.BytesIO(buf)
    while True:
        start = stream.tell()
        if start >= len(buf):
            break
        try:
            with gzip.GzipFile(fileobj=stream) as gz:
                out.write(gz.read())
        except (OSError, EOFError):
            break
        if stream.tell() == start:  # no forward progress — corrupt tail
            break
    return out.getvalue()


def parse_warc_bytes(buf: bytes) -> Iterator[dict]:
    """Yield one dict per HTTP-200 response record:
    url, warc_ts (datetime), html (bytes), http_status, content_type.
    Tolerant of a truncated trailing record (yielded records are always
    complete)."""
    buf = _gunzip_all(buf)
    i, n = 0, len(buf)
    while i < n:
        while buf[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        head_end = buf.find(b"\r\n\r\n", i)
        if head_end < 0:
            break
        head = buf[i:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            break
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs.get("content-length", "0"))
        except ValueError:
            break
        payload = buf[head_end + 4:head_end + 4 + clen]
        i = head_end + 4 + clen
        if len(payload) < clen:
            break  # truncated trailing record
        if hdrs.get("warc-type", "").lower() != "response":
            continue
        url = hdrs.get("warc-target-uri", "")
        ts = None
        raw_ts = hdrs.get("warc-date", "")
        try:
            ts = datetime.strptime(
                raw_ts, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)
        except ValueError:
            pass
        http_end = payload.find(b"\r\n\r\n")
        if http_end < 0:
            continue
        http_head = payload[:http_end].decode("utf-8", "replace")
        http_lines = http_head.split("\r\n")
        status = 0
        parts = http_lines[0].split()
        if len(parts) >= 2 and parts[0].startswith("HTTP/"):
            try:
                status = int(parts[1])
            except ValueError:
                status = 0
        ctype = ""
        for ln in http_lines[1:]:
            k, _, v = ln.partition(":")
            if k.strip().lower() == "content-type":
                ctype = v.strip()
                break
        if status != 200:
            continue
        yield {
            "url": url,
            "warc_ts": ts,
            "html": payload[http_end + 4:],
            "http_status": status,
            "content_type": ctype,
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Parse WARC segment files under ``path`` (glob ok; ``.warc`` and
    ``.warc.gz``) into ``(url, warc_ts, html, http_status,
    content_type)`` — one output row per HTTP-200 response record."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(content)))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "url", "warc_ts", "html", "http_status",
                    "content_type"])

    return files.select("content").mapInPandas(parse, _PAGE_SCHEMA)


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC records in the engine's pages schema ``(url, warc_ts, html,
    text, lang)``: text via the Arrow-vectorized extractor
    (sources/extraction.py — byte-identical to the reference's
    extraction on the same html), lang via the function-word
    language-ID heuristic (pipeline/text.py)."""
    from pyspark.sql import functions as F

    from ..pipeline.text import language_id
    from .extraction import extract_text

    recs = read_warc(spark, path).withColumn(
        "text", extract_text(F.col("html")))
    lang = language_id(
        recs.select(F.col("url").alias("doc_id"), "text"))
    return (
        recs.join(lang.withColumnRenamed("doc_id", "url"), "url", "left")
        .select("url", "warc_ts", "html", "text",
                F.coalesce(F.col("pred_lang"), F.lit("und")).alias("lang"))
    )
