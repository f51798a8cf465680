"""Host-level rollup of a page-level link graph.

The canonical web-scale pre-aggregation: a 10^12-edge page graph
collapses to a host graph orders of magnitude smaller (Common Crawl's
own host- and domain-level graph releases are exactly this rollup), so
host-PageRank-style analyses run on the reduced table. The reference
engine has no URL semantics (its graphs are anonymous node ids —
core/graphbuilder ImportTool takes pre-extracted ids); this operator is
part of the web-text pipeline surface around it.

Plan shape at scale: one projection (regexp on two string columns) and
ONE hash aggregation with map-side partial combine — the |E_pages| →
|E_hosts| reduction happens before the shuffle, so the exchanged bytes
are bounded by (distinct host pairs per input partition), not by page
edges. No joins, no Python. Hub hosts (every page links to a few mega
hosts) make the *output* skewed but not the shuffle: partial aggregation
compresses each partition's contribution to a hub key to a single row
before it moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["url_host", "host_graph"]

# scheme://host[:port]/... → capture group 1 = authority without
# userinfo/path/query/fragment. Mirrored literally in the DuckDB oracle
# (__spark_entry__._HOST_RE_SQL) — keep the two in sync.
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def url_host(url: Column | str) -> Column:
    """Lower-cased host part of a URL column ('' when unparseable)."""
    col = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(col, HOST_RE, 1))


def host_graph(
    url_edges: DataFrame,
    *,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    drop_self_loops: bool = False,
) -> DataFrame:
    """(src_host, dst_host, weight) — weight = number of input edges
    between the two hosts. Feed deduplicated page edges for "distinct
    page links" semantics, raw edges for "total links" semantics.

    ``drop_self_loops`` removes intra-host edges (often the majority of
    a site's links; host-rank analyses usually want only cross-host
    endorsements).
    """
    h = url_edges.select(
        url_host(src_col).alias("src_host"),
        url_host(dst_col).alias("dst_host"),
    )
    if drop_self_loops:
        h = h.filter(F.col("src_host") != F.col("dst_host"))
    return h.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("weight")
    )
