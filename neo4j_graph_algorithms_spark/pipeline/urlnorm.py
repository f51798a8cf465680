"""URL canonicalization and canonical-URL deduplication.

A Common-Crawl-scale corpus carries the same page under many spellings:
scheme/host case, explicit default ports, fragments, tracking
parameters (``utm_*``/``gclid``/``fbclid``), permuted query strings,
and trailing slashes. Collapsing those BEFORE content dedup removes the
cheapest duplicate class with zero text processing — one map-only
normalization plus one keyed aggregation, versus MinHash's
per-document signature work.

The reference engine has no URL semantics (its graphs are anonymous
node ids — core/graphbuilder ImportTool takes pre-extracted ids);
this sits with ``operators/hostgraph.py`` on the web-text pipeline
surface around it.

Canonicalization grammar (documented, deliberately restricted to
``scheme://host[:port][/path][?query][#fragment]`` without userinfo —
the shape of crawl URLs):

1. scheme and host lower-cased (RFC 3986 §6.2.2.1);
2. fragment dropped (never sent to the server);
3. default port dropped (``http:80``, ``https:443``);
4. query split on ``&``; empty params and tracking params
   (``utm_*``, ``gclid``, ``fbclid``, ``ref``) dropped; the remainder
   byte-sorted and re-joined (RFC 3986 says order is significant, but
   crawl dedup wants the aggressive form — flagged here);
5. empty path becomes ``/``; a trailing slash run is stripped from any
   longer path (``/a/`` → ``/a``).

Plan shape at scale: :func:`canonicalize_url` is a pure column
expression — regexps + array ops, whole-stage-codegen'd, zero shuffle,
zero Python. :func:`url_dedup` adds ONE hash aggregation keyed by the
canonical URL with map-side partial combine (max_by struct), so the
exchanged bytes are bounded by distinct canonical URLs per partition.
No window functions (a global row_number would single-partition the
sort), no joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["canonicalize_url", "url_dedup", "TRACKING_PARAM_RE"]

# dropped query parameters: the usual analytics/click-id noise. A param
# matches when its NAME (before '=' or end) matches. Mirrored literally
# in the DuckDB oracle (__spark_entry__._TRACKING_RE_SQL) — keep in sync.
TRACKING_PARAM_RE = r"^(utm_[^=&]*|gclid|fbclid|ref)(=|$)"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
# host without port; same authority grammar as hostgraph.HOST_RE minus
# the userinfo branch (crawl URLs carry none).
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)"
_PORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored before any '#': a fragment containing '?' (http://h/p#a?b=1)
# must NOT leak into the query — the non-greedy [^#]*? prefix guarantees
# the matched '?' precedes the first '#'. Mirrored in the DuckDB oracle.
_QUERY_RE = r"^[^#]*?\?([^#]*)"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL column — a single codegen'd expression
    (no UDF): lower scheme/host, drop fragment + default port +
    tracking params, sort the surviving query params, normalize the
    path's trailing slash. Unparseable rows (no ``scheme://``) pass
    through unchanged so the caller can route them to a quarantine
    branch instead of silently merging them."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    port = F.regexp_extract(u, _PORT_RE, 1)
    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)

    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
        F.lit(""))

    stripped = F.regexp_replace(raw_path, r"/+$", "")
    path_part = F.when(stripped == "", F.lit("/")).otherwise(stripped)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qstr = F.array_join(F.array_sort(params), "&")
    query_part = F.when(qstr == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qstr))

    canon = F.concat(scheme, F.lit("://"), host, port_part, path_part,
                     query_part)
    return F.when(scheme == "", u).otherwise(canon)


def url_dedup(
    pages: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str | None = None,
) -> DataFrame:
    """One surviving row per canonical URL: the LATEST capture wins
    (re-crawl semantics, like :func:`~...pipeline.dedup.keep_latest`
    but keyed by canonical URL instead of raw URL or content hash).

    Returns ``(canonical_url, <all input columns of the winner>,
    n_variants)`` where ``n_variants`` counts the collapsed rows.

    Tie-break: equal timestamps fall back to the lexicographically
    LARGEST raw URL (then largest ``id_col`` when given) so the winner
    is a pure function of the input set — required for the driver's
    value-hash oracle and for idempotent re-runs.

    Scale: one hash aggregation (``max_by`` over a comparable struct)
    with map-side partial combine — no window, no join, no shuffle of
    the text/html payload beyond the winning rows.
    """
    canon = canonicalize_url(url_col).alias("canonical_url")
    order_cols = [F.col(ts_col), F.col(url_col)]
    if id_col is not None:
        order_cols.append(F.col(id_col))
    payload = F.struct(*[F.col(c) for c in pages.columns])
    keyed = pages.select(canon, F.struct(*order_cols).alias("_ord"),
                         payload.alias("_row"))
    agg = keyed.groupBy("canonical_url").agg(
        F.max_by("_row", "_ord").alias("_row"),
        F.count(F.lit(1)).alias("n_variants"),
    )
    return agg.select(
        "canonical_url",
        *[F.col(f"_row.{c}").alias(c) for c in pages.columns],
        "n_variants",
    )
