"""Sources & sinks: synthetic Common-Crawl-style pages, link/text
extraction, edge-table readers.

The reference's source layer scans a Neo4j store (SURVEY.md §2.1); this
engine's input is an Iceberg/Parquet table of web pages
``(url, warc_ts, html, text, lang)`` per BASELINE.json's input_hint, from
which a deduplicated ``(src, dst)`` edge table is extracted with
vectorized Arrow UDFs (no per-row Python).
"""

from neo4j_graph_algorithms_spark.sources.pages import generate_pages, expected_edges
from neo4j_graph_algorithms_spark.sources.warc import (
    read_warc,
    warc_pages,
)
from neo4j_graph_algorithms_spark.sources.extraction import (
    extract_text,
    extract_links,
    extract_edges,
    extract_anchors,
    anchor_stats,
    normalize_url,
)

__all__ = [
    "read_warc",
    "warc_pages",
    "generate_pages",
    "expected_edges",
    "extract_text",
    "extract_links",
    "extract_edges",
    "extract_anchors",
    "anchor_stats",
    "normalize_url",
]
