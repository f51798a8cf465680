"""Vectorized text & link extraction from raw page HTML.

This is the engine's "Cypher projection" equivalent (reference:
core/.../heavyweight/HeavyCypherGraphFactory.java:35-73 — an arbitrary
query produces the node/edge lists): an arbitrary DataFrame expression
over the pages table produces the ``(src, dst)`` edge table.

Everything is Arrow-vectorized (``pandas_udf`` over whole columns — the
input_hint's "no per-row Python" means no row-at-a-time Python UDFs;
pandas ``.str`` ops run C-side over each Arrow batch).

Invariant (BASELINE.json input_hint): extracted text per url is
byte-identical to the reference extraction — pinned by the generator
fixture: ``extract_text(pages.html) == pages.text`` exactly, asserted in
tests/test_extraction.py.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, Column, functions as F
from pyspark.sql import types as T

__all__ = ["extract_text", "extract_links", "normalize_url",
           "extract_edges", "extract_anchors", "anchor_stats"]

_P_TAG = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_HREF = re.compile(r'<a\s[^>]*?href="([^"#]*)(?:#[^"]*)?"', re.IGNORECASE)
_A_TAG = re.compile(
    r'<a\s[^>]*?href="([^"#]*)(?:#[^"]*)?"[^>]*>(.*?)</a>',
    re.IGNORECASE | re.DOTALL,
)


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Extraction spec: UTF-8 decode, concatenate the contents of all
    ``<p>`` elements in document order joined by a single newline.
    Deterministic & byte-stable per url (the golden invariant)."""
    decoded = html.apply(lambda b: b.decode("utf-8", errors="replace"))
    return decoded.str.findall(_P_TAG).str.join("\n")


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    """All ``<a href>`` targets in document order (fragments stripped)."""
    decoded = html.apply(lambda b: b.decode("utf-8", errors="replace"))
    return decoded.str.findall(_HREF)


def normalize_url(col: Column) -> Column:
    """URL normalization, all JVM-side expressions (codegen'd — no UDF):
    strip fragment, lowercase ``scheme://host`` (path case preserved),
    strip a trailing slash from non-root paths."""
    c = F.regexp_replace(col, r"#.*$", "")
    head = F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    tail = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$", 1)
    c = F.when(head != "", F.concat(F.lower(head), tail)).otherwise(c)
    non_root_dir = c.rlike(r"://[^/]+/.+/$")
    return F.when(non_root_dir, c.substr(F.lit(1), F.length(c) - 1)).otherwise(c)


@F.pandas_udf(T.ArrayType(T.StructType([
    T.StructField("href", T.StringType()),
    T.StructField("text", T.StringType()),
])))
def extract_anchors(html: pd.Series) -> pd.Series:
    """All ``<a href>`` (target, anchor-text) pairs in document order —
    the anchor-text signal Common-Crawl pipelines aggregate per target
    page. Same Arrow-vectorized shape as :func:`extract_links`."""
    decoded = html.apply(lambda b: b.decode("utf-8", errors="replace"))
    return decoded.apply(
        lambda s: [{"href": h, "text": t} for h, t in _A_TAG.findall(s)]
    )


def anchor_stats(pages: DataFrame) -> DataFrame:
    """Per target page, the incoming anchor-text rollup:
    (dst_url, n_links, n_distinct_anchors, top_anchor, top_count) —
    top_anchor = the most frequent anchor string pointing at the page,
    ties to the lexicographically smaller string.

    100-TB shape: one vectorized extraction pass, then two partially
    aggregated shuffles keyed by (dst, anchor) and dst. The top-anchor
    pick is a struct-min AGGREGATE (min over (−count, anchor)), not a
    per-dst window sort — hub pages with 10⁸ in-links cost one combiner
    cell, not a sort of 10⁸ rows."""
    a = pages.select(
        F.col("url").alias("src_url"),
        F.explode(extract_anchors(F.col("html"))).alias("a"),
    ).select(
        "src_url",
        F.col("a.href").alias("dst_url"),
        F.col("a.text").alias("anchor"),
    )
    per = a.groupBy("dst_url", "anchor").agg(F.count(F.lit(1)).alias("c"))
    top = F.min(
        F.struct((-F.col("c")).alias("nc"), F.col("anchor").alias("a"))
    )
    return (
        per.groupBy("dst_url")
        .agg(
            F.sum("c").alias("n_links"),
            F.count(F.lit(1)).alias("n_distinct_anchors"),
            top.alias("_top"),
        )
        .select(
            "dst_url",
            "n_links",
            "n_distinct_anchors",
            F.col("_top.a").alias("top_anchor"),
            (-F.col("_top.nc")).cast("long").alias("top_count"),
        )
    )


def extract_edges(pages: DataFrame, dedup: bool = True) -> DataFrame:
    """Pages → ``(src_url, dst_url)`` edge table.

    One vectorized pass (``extract_links``) + ``explode`` — the explode
    and the optional ``DISTINCT`` (≡ the reference's adjacency dedup,
    AdjacencyCompression.java:66-77) are JVM-side. Self-links survive
    (AdjacencyCompression.java:30-33 keeps self-loops once).
    """
    e = (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_links(F.col("html"))).alias("dst_url"),
        )
    )
    if dedup:
        e = e.dropDuplicates(["src_url", "dst_url"])
    return e
