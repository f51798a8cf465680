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

__all__ = ["url_host", "url_domain", "host_graph", "domain_graph",
           "with_registrable_domain", "mirror_hosts", "crawl_frontier"]

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


# Common multi-label public suffixes (compact heuristic list — NOT the
# full Mozilla PSL; covers the dominant crawl mass. For full-PSL
# accuracy pass the list as a table to ``with_registrable_domain``.)
_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.nz", "net.nz", "org.nz",
    "co.za", "org.za", "web.za",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
)


def url_domain(url: Column | str) -> Column:
    """Registrable domain of a URL column: the public suffix plus one
    label ('example.co.uk' for 'a.b.example.co.uk'; 'example.org' for
    'h7.example.org'). Pure JVM column expression — split + a
    suffix-list membership check, no UDF."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.when(n >= 3, F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1)))
    is_multi = last2.isin(*_MULTI_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_multi, F.coalesce(last3, host))
        .otherwise(last2)
    )


def with_registrable_domain(
    df: DataFrame,
    url_col: str,
    *,
    out_col: str = "domain",
    suffixes: DataFrame | None = None,
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Add a registrable-domain column computed from ``url_col``.

    With ``suffixes`` — a DataFrame with one string column ``suffix``
    holding the full public suffix list (e.g. the Mozilla PSL's plain
    rules) — matching is longest-suffix-wins via ``max_suffix_labels``
    BROADCAST hash joins (one per candidate suffix length, all
    map-side: the PSL is ~10k rows, the page table never shuffles).
    Hosts matching no rule fall back to the PSL's implicit ``*`` rule
    (the TLD is the public suffix → registrable domain = last two
    labels); a host that IS a public suffix maps to itself. Without
    ``suffixes`` the compact :func:`url_domain` heuristic is used.
    """
    host = url_host(F.col(url_col))
    if suffixes is None:
        return df.withColumn(out_col, url_domain(F.col(url_col)))

    out = (
        df.withColumn("_rd_host", host)
        .withColumn("_rd_parts", F.split(F.col("_rd_host"), r"\."))
        .withColumn("_rd_n", F.size(F.col("_rd_parts")))
    )
    ks = list(range(min(max_suffix_labels, 4), 0, -1))
    for k in ks:
        cand = F.when(
            F.col("_rd_n") >= k,
            F.concat_ws(".", *[F.element_at(F.col("_rd_parts"), -i)
                               for i in range(k, 0, -1)]),
        )
        sfx = F.broadcast(
            suffixes.select(F.col("suffix").alias(f"_rd_m{k}"))
            .dropDuplicates()
        )
        out = out.join(sfx, F.col(f"_rd_m{k}") == cand, "left")
    mk = F.coalesce(*[
        F.when(F.col(f"_rd_m{k}").isNotNull(), F.lit(k)) for k in ks
    ])
    # last (mk + 1) labels, 1-based slice
    dom = F.array_join(
        F.slice(F.col("_rd_parts"), F.col("_rd_n") - mk, mk + F.lit(1)),
        ".",
    )
    domain = (
        F.when(mk.isNull(),
               F.when(F.col("_rd_n") <= 2, F.col("_rd_host"))
               .otherwise(F.concat_ws(
                   ".", F.element_at(F.col("_rd_parts"), -2),
                   F.element_at(F.col("_rd_parts"), -1))))
        .when(F.col("_rd_n") <= mk, F.col("_rd_host"))
        .otherwise(dom)
    )
    drop = ["_rd_host", "_rd_parts", "_rd_n"] + [f"_rd_m{k}" for k in ks]
    return out.withColumn(out_col, domain).drop(*drop)


def domain_graph(
    url_edges: DataFrame,
    *,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    drop_self_loops: bool = False,
) -> DataFrame:
    """(src_domain, dst_domain, weight) — :func:`host_graph` at
    registrable-domain granularity (Common Crawl's domain-level graph)."""
    h = url_edges.select(
        url_domain(F.col(src_col)).alias("src_domain"),
        url_domain(F.col(dst_col)).alias("dst_domain"),
    )
    if drop_self_loops:
        h = h.filter(F.col("src_domain") != F.col("dst_domain"))
    return h.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).alias("weight")
    )


def mirror_hosts(
    pages: DataFrame,
    *,
    url_col: str = "url",
    text_col: str = "text",
    min_shared: int = 2,
    df_cutoff: int = 1000,
) -> DataFrame:
    """Mirror-site detection (Bharat & Broder WWW'99): host pairs whose
    page-content fingerprint sets overlap — the crawl-level dedup that
    URL canonicalization cannot catch (same content, different site).

    Returns ``(host_a, host_b, shared, resemblance)`` with
    ``resemblance = |A∩B| / |A∪B|`` over each host's DISTINCT content
    fingerprints, pairs with ``shared >= min_shared``, ``host_a <
    host_b``.

    Scale shape — the inverted-index self-join discipline of
    ``pipeline/dedup.py:token_jaccard_pairs``: fingerprints occurring
    on more than ``df_cutoff`` hosts (cross-web boilerplate like empty
    pages) are pruned BEFORE the self-join, so the pair fan-out per
    fingerprint is bounded; everything else is two hash aggregations
    and one equality join.
    """
    fp = (
        pages.select(url_host(url_col).alias("host"),
                     F.md5(F.col(text_col)).alias("fp"))
        .distinct()
    )
    hot = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("_nh"))
    fp_cool = fp.join(
        hot.where(F.col("_nh") <= df_cutoff).select("fp"), "fp")
    sizes = fp_cool.groupBy("host").agg(F.count(F.lit(1)).alias("_sz"))
    a = fp_cool.select(F.col("host").alias("host_a"), "fp")
    b = fp_cool.select(F.col("host").alias("host_b"), "fp")
    shared = (
        a.join(b, "fp")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col("host").alias("host_a"),
                      F.col("_sz").alias("_sa"))
    sb = sizes.select(F.col("host").alias("host_b"),
                      F.col("_sz").alias("_sb"))
    return (
        shared.join(sa, "host_a").join(sb, "host_b")
        .select(
            "host_a", "host_b", "shared",
            F.round(F.col("shared").cast("double")
                    / (F.col("_sa") + F.col("_sb") - F.col("shared")), 6)
            .alias("resemblance"),
        )
    )


def crawl_frontier(
    url_edges: DataFrame,
    crawled: DataFrame,
    *,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    crawled_col: str = "url",
) -> DataFrame:
    """Frontier discovery: link targets NOT yet crawled, with the
    in-link evidence a scheduler prioritizes by (the OPIC/indegree
    signal feeding a Nutch-style fetch queue).

    Returns ``(url, n_inlinks, n_src_hosts)`` — distinct-edge in-link
    count and the number of distinct linking hosts (cross-host
    endorsements rank higher than one site's internal fan-out).

    Scale shape: one distinct on the edge list, one anti-join against
    the crawled set (both sides keyed by URL — bucketed layouts make
    the crawled side exchange-free), one dst-keyed aggregation with
    map-side combine.
    """
    e = url_edges.select(F.col(src_col).alias("src_url"),
                         F.col(dst_col).alias("dst_url")).distinct()
    fresh = e.join(
        crawled.select(F.col(crawled_col).alias("dst_url")).distinct(),
        "dst_url", "left_anti")
    return (
        fresh.groupBy(F.col("dst_url").alias("url"))
        .agg(F.count(F.lit(1)).alias("n_inlinks"),
             F.countDistinct(url_host("src_url")).alias("n_src_hosts"))
    )
