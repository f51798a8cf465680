"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2) over a
link graph **derived deterministically from the TPC-H-ish test tables**
(so the DuckDB oracle can build the identical graph):

    edges = SELECT DISTINCT l_orderkey % 1000 AS src,
                            l_partkey  % 1000 AS dst   FROM lineitem

plus the training-data pipeline operators over ``documents`` /
``embeddings`` / ``events``. Every float output is rounded (6 dp) in
BOTH engines so order-of-summation noise cannot break the value-hash.

Iterative oracles: PageRank is unrolled as chained CTEs (fixed 10
iterations, per-node formulation, dangling nodes push nothing); WCC is a
recursive-CTE min-label closure; LPA is 4 unrolled synchronous rounds
with the deterministic (max votes, min label) tie-break.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
from neo4j_graph_algorithms_spark.operators.wcc import connected_components
from neo4j_graph_algorithms_spark.operators.labelprop import label_propagation
from neo4j_graph_algorithms_spark.operators.triangles import triangle_count
from neo4j_graph_algorithms_spark.operators.degree import degree_centrality

N_MOD = 1000
PR_ITERS = 10
LPA_ITERS = 4

# ---------------------------------------------------------------------------
# shared loading helpers (Spark side)
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % N_MOD).alias("src"),
            (F.col("l_partkey") % N_MOD).alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
    )


def _edges_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """weight = parallel-edge multiplicity (DuplicateRelationshipsStrategy
    SUM over unit weights)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % N_MOD).alias("src"),
            (F.col("l_partkey") % N_MOD).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


# SQL fragments shared by the DuckDB oracles
_EDGES_CTE = (
    f"edges AS (SELECT DISTINCT l_orderkey % {N_MOD} AS src, "
    f"l_partkey % {N_MOD} AS dst FROM lineitem)"
)
_WEDGES_CTE = (
    f"wedges AS (SELECT l_orderkey % {N_MOD} AS src, l_partkey % {N_MOD} AS dst, "
    f"CAST(count(*) AS DOUBLE) AS weight FROM lineitem GROUP BY 1, 2)"
)
_NODES_CTE = (
    "nodes AS (SELECT DISTINCT id FROM "
    "(SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges))"
)
_CANON_CTE = (
    "canon AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi "
    "FROM edges WHERE src <> dst)"
)
_UND_DEG_CTE = (
    "udeg AS (SELECT id, count(*) AS deg FROM "
    "(SELECT lo AS id FROM canon UNION ALL SELECT hi FROM canon) GROUP BY id)"
)
_NBRS_CTE = (
    "nbrs AS (SELECT lo AS id, hi AS nbr FROM canon "
    "UNION ALL SELECT hi AS id, lo AS nbr FROM canon)"
)
_SCANON_CTE = (
    "scanon AS (SELECT lo, hi FROM canon WHERE "
    "(\'0x\' || substr(md5(CAST(lo AS VARCHAR) || \'|\' || "
    "CAST(hi AS VARCHAR) || \'#tri0\'), 1, 8))::BIGINT % 1048576 "
    "< 524288)"
)
_STRI_CTE = (
    "stri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c FROM scanon e1 "
    "JOIN scanon e2 ON e2.lo = e1.hi "
    "JOIN scanon e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)"
)

_TRI_CTE = (
    "tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c FROM canon e1 "
    "JOIN canon e2 ON e2.lo = e1.hi "
    "JOIN canon e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)"
)
_TRI_PER_NODE_CTE = (
    _TRI_CTE + ", corners AS (SELECT a AS id FROM tri UNION ALL "
    "SELECT b FROM tri UNION ALL SELECT c FROM tri), "
    "pern AS (SELECT id, count(*) AS triangles FROM corners GROUP BY id)"
)


def _pagerank_unrolled_sql(iters: int, weighted: bool) -> str:
    """Chained-CTE fixed-iteration PageRank (per-node formulation,
    damping 0.85, dangling nodes push nothing, NOT normalized)."""
    if weighted:
        e_cte = _WEDGES_CTE.replace("wedges AS", "edges AS")
        deg = "deg AS (SELECT src, sum(weight) AS outw FROM edges WHERE weight > 0 GROUP BY src)"
        fac = ("fac AS (SELECT e.src, e.dst, e.weight / d.outw AS factor "
               "FROM edges e JOIN deg d ON e.src = d.src WHERE e.weight > 0)")
    else:
        e_cte = _EDGES_CTE
        deg = "deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src)"
        fac = ("fac AS (SELECT e.src, e.dst, 1.0 / d.outd AS factor "
               "FROM edges e JOIN deg d ON e.src = d.src)")
    parts = [e_cte, _NODES_CTE, deg, fac,
             "r0 AS (SELECT id, CAST(0.15 AS DOUBLE) AS rank FROM nodes)"]
    for i in range(1, iters + 1):
        parts.append(
            f"m{i} AS (SELECT f.dst AS id, sum(r.rank * f.factor) AS msg "
            f"FROM fac f JOIN r{i-1} r ON f.src = r.id GROUP BY f.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT n.id, 0.15 + 0.85 * coalesce(m.msg, 0.0) AS rank "
            f"FROM nodes n LEFT JOIN m{i} m ON n.id = m.id)"
        )
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT id, round(rank, 6) AS rank FROM r{iters}")


def _pagerank_tolerance_unrolled_sql(max_iters: int, tol: float,
                                     block: int,
                                     prefix: list[str] | None = None) -> str:
    """Tolerance-convergence PageRank oracle.

    Mirrors ``operators/pagerank.py`` with ``tol>0``: supersteps are
    fused into blocks of ``block`` (the ``unroll`` parameter), and the
    loop stops at the first block boundary ``it`` where
    ``max|r_it − r_{it−block}| < tol`` (capped at ``max_iters``). The
    oracle unrolls every iteration as MATERIALIZED CTEs, computes the
    block deltas, picks the first converged boundary, and emits that
    level's ranks — the exact ranks Spark returns, including the
    stopping rule.

    MATERIALIZED everywhere a CTE is referenced twice: DuckDB inlines
    plain CTEs and the r{i}→(m{i+1}, d{it}, levels) fan-out would
    otherwise recompute the whole chain per reference."""
    parts = list(prefix) if prefix is not None else [_EDGES_CTE, _NODES_CTE]
    parts += [
        "deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src)",
        "fac AS MATERIALIZED (SELECT e.src, e.dst, 1.0 / d.outd AS factor "
        "FROM edges e JOIN deg d ON e.src = d.src)",
        "r0 AS MATERIALIZED (SELECT id, CAST(0.15 AS DOUBLE) AS rank "
        "FROM nodes)",
    ]
    boundaries = list(range(block, max_iters + 1, block))
    if boundaries[-1] != max_iters:  # trailing partial block
        boundaries.append(max_iters)
    for i in range(1, max_iters + 1):
        parts.append(
            f"m{i} AS (SELECT f.dst AS id, sum(r.rank * f.factor) AS msg "
            f"FROM fac f JOIN r{i-1} r ON f.src = r.id GROUP BY f.dst)"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT n.id, "
            f"0.15 + 0.85 * coalesce(m.msg, 0.0) AS rank "
            f"FROM nodes n LEFT JOIN m{i} m ON n.id = m.id)"
        )
    prev = 0
    for it in boundaries:
        parts.append(
            f"d{it} AS MATERIALIZED (SELECT max(abs(a.rank - b.rank)) AS d "
            f"FROM r{it} a JOIN r{prev} b ON a.id = b.id)"
        )
        prev = it
    vals = ", ".join(f"({it}, (SELECT d FROM d{it}))" for it in boundaries)
    parts.append(
        f"conv AS (SELECT coalesce(min(it), {max_iters}) AS it "
        f"FROM (VALUES {vals}) t(it, d) WHERE d < {tol!r})"
    )
    levels = " UNION ALL ".join(
        f"SELECT {it} AS it, id, rank FROM r{it}" for it in boundaries
    )
    parts.append(f"levels AS ({levels})")
    return ("WITH " + ",\n".join(parts) +
            "\nSELECT id, round(rank, 6) AS rank FROM levels "
            "WHERE it = (SELECT it FROM conv)")


# --- pure-SQL replica of the synthetic pages link generator ------------
# sources/pages.py derives every link from splitmix64 mixing of the page
# index; replaying that arithmetic in DuckDB (64-bit wraparound multiply
# emulated via HUGEINT split-multiply) gives a fully independent oracle
# for the extraction pipeline: Spark builds html and regex-extracts the
# anchors, the oracle recomputes the link list directly — any drift in
# generation, extraction, or dedup breaks the match.
_M64 = 1 << 64
_M32 = 1 << 32
_MIX_C1 = 0x9E3779B97F4A7C15
_MIX_C2 = 0xBF58476D1CE4E5B9
_MIX_C3 = 0x94D049BB133111EB


def _sql_xorshift(x: str, s: int) -> str:
    return f"xor({x}, ({x} >> {s}))"


def _sql_mulmod64(x: str, c: int) -> str:
    """(x * c) mod 2^64 on UBIGINT, via 32-bit split so the HUGEINT
    intermediates stay below 2^97 (a full 64×64 product would overflow
    signed 128-bit)."""
    h = f"CAST({x} AS HUGEINT)"
    return (f"CAST(((({h} % {_M32}) * {c}) + "
            f"(((({h} // {_M32}) * {c}) % {_M32}) * {_M32})) % {_M64} "
            f"AS UBIGINT)")


def _sql_addmod64(x: str, c: int) -> str:
    return f"CAST((CAST({x} AS HUGEINT) + {c}) % {_M64} AS UBIGINT)"


def _mix64_chain(name: str, keep: str) -> list[str]:
    """CTEs name1..name4: splitmix64 finalizer of CTE name0's ``x``."""
    stages = [
        _sql_addmod64("x", _MIX_C1),
        _sql_mulmod64(_sql_xorshift("x", 30), _MIX_C2),
        _sql_mulmod64(_sql_xorshift("x", 27), _MIX_C3),
        _sql_xorshift("x", 31),
    ]
    return [
        f"{name}{k+1} AS (SELECT {keep}, {expr} AS x FROM {name}{k})"
        for k, expr in enumerate(stages)
    ]


def _incremental_pagerank_sql(iters: int) -> str:
    """Oracle for pagerank_incremental: ``iters`` fixed PageRank
    iterations on the base graph produce the warm start, then ``iters``
    plain power-iteration steps on the perturbed graph (the deterministic
    ``(src*31+dst)%23 <> 0`` edge drop). Warm-started delta propagation
    at θ=0/tol=0 IS the plain power iteration from x_prev
    (operators/pagerank.py:pagerank_delta initial_ranks path), so the
    replay needs no delta bookkeeping."""
    parts = [
        _EDGES_CTE, _NODES_CTE,
        "deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src)",
        "fac AS MATERIALIZED (SELECT e.src, e.dst, 1.0 / d.outd AS factor "
        "FROM edges e JOIN deg d ON e.src = d.src)",
        "r0 AS (SELECT id, CAST(0.15 AS DOUBLE) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"m{i} AS (SELECT f.dst AS id, sum(r.rank * f.factor) AS msg "
            f"FROM fac f JOIN r{i-1} r ON f.src = r.id GROUP BY f.dst)")
        parts.append(
            f"r{i} AS (SELECT n.id, 0.15 + 0.85 * coalesce(m.msg, 0.0) "
            f"AS rank FROM nodes n LEFT JOIN m{i} m ON n.id = m.id)")
    parts += [
        "edges1 AS (SELECT src, dst FROM edges "
        "WHERE (src * 31 + dst) % 23 <> 0)",
        "deg1 AS (SELECT src, count(*) AS outd FROM edges1 GROUP BY src)",
        "fac1 AS MATERIALIZED (SELECT e.src, e.dst, 1.0 / d.outd AS factor "
        "FROM edges1 e JOIN deg1 d ON e.src = d.src)",
        f"s0 AS (SELECT id, rank FROM r{iters})",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"n{i} AS (SELECT f.dst AS id, sum(s.rank * f.factor) AS msg "
            f"FROM fac1 f JOIN s{i-1} s ON f.src = s.id GROUP BY f.dst)")
        parts.append(
            f"s{i} AS (SELECT n.id, 0.15 + 0.85 * coalesce(m.msg, 0.0) "
            f"AS rank FROM nodes n LEFT JOIN n{i} m ON n.id = m.id)")
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT id, round(rank, 6) AS rank FROM s{iters}")


def _sql_page_url(var: str, n_hosts: int = 1) -> str:
    """SQL expression for sources/pages.py:page_url(var, n_hosts)."""
    if n_hosts <= 1:
        return f"'https://example.org/p/' || CAST({var} AS VARCHAR)"
    return (f"'https://h' || CAST({var} % {n_hosts} AS VARCHAR) || "
            f"'.example.org/p/' || CAST({var} AS VARCHAR)")


def _pages_linklist_parts(n: int, seed: int = 42,
                          max_degree: int = 64,
                          n_hosts: int = 1) -> list[str]:
    """CTE chain ending in ``plinks(src_url, dst_url)`` — the exact link
    list of ``generate_pages(spark, n)`` (duplicates preserved),
    replaying sources/pages.py:_out_degree/_targets_for in SQL."""
    import math as _math

    # embed float64 constants as round-trip decimal literals so DuckDB
    # parses bit-identical doubles
    ln_md = repr(_math.log(max_degree))
    dc = (seed * 0x1234567) ^ 0xDEAD
    u = f"CAST((x >> 11) AS DOUBLE) / {float(1 << 53)!r}"
    parts = [f"p AS (SELECT CAST(range AS UBIGINT) AS i FROM range({n}))"]
    parts.append(f"dg0 AS (SELECT i, xor(i, CAST({dc} AS UBIGINT)) AS x "
                 f"FROM p)")
    parts += _mix64_chain("dg", "i")
    parts.append(f"du AS (SELECT i, {u} AS u FROM dg4)")
    parts.append(f"dn0 AS (SELECT i, xor(i, CAST({0xBEEF} AS UBIGINT)) AS x "
                 f"FROM p)")
    parts += _mix64_chain("dn", "i")
    parts.append(f"dnu AS (SELECT i, {u} AS u FROM dn4)")
    parts.append(
        "degs AS MATERIALIZED (SELECT p.i, CASE WHEN dnu.u < 0.08 THEN 0 "
        f"ELSE least(greatest(CAST(floor(exp(du.u * {ln_md})) AS BIGINT), 0)"
        f", {max_degree}) END AS deg "
        "FROM p JOIN du ON p.i = du.i JOIN dnu ON p.i = dnu.i)")
    parts.append(
        f"tj AS (SELECT d.i, CAST(j.range AS UBIGINT) AS j FROM degs d "
        f"JOIN range({max_degree}) j ON j.range < d.deg)")
    parts.append(
        f"tg0 AS (SELECT i, j, xor({_sql_mulmod64('i', _MIX_C1)}, "
        f"CAST(j + {seed} AS UBIGINT)) AS x FROM tj)")
    parts += _mix64_chain("tg", "i, j")
    parts.append(f"tu AS (SELECT i, j, {u} AS u FROM tg4)")
    parts.append(
        f"tt AS (SELECT i, j, least(greatest("
        f"CAST(floor(({n} * u) * u) AS BIGINT), 0), {n - 1}) AS t FROM tu)")
    parts.append(
        "plinks AS MATERIALIZED (SELECT "
        f"{_sql_page_url('i', n_hosts)} AS src_url, "
        f"{_sql_page_url('t', n_hosts)} AS dst_url, "
        "CAST(j AS BIGINT) AS link_pos FROM tt)")
    return parts


# DuckDB twin of operators/hostgraph.py:HOST_RE (RE2 syntax, identical)
_HOST_RE_SQL = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def _host_rollup_parts(n: int, n_hosts: int) -> list[str]:
    """plinks → distinct page edges → host rollup (self-loops dropped):
    hw(src_host, dst_host, weight) — oracle of operators/hostgraph.py
    over the n-page multi-host link list."""
    return _pages_linklist_parts(n, n_hosts=n_hosts) + [
        "uedges AS MATERIALIZED (SELECT DISTINCT src_url, dst_url "
        "FROM plinks)",
        f"hedges AS (SELECT "
        f"lower(regexp_extract(src_url, '{_HOST_RE_SQL}', 1)) AS src_host, "
        f"lower(regexp_extract(dst_url, '{_HOST_RE_SQL}', 1)) AS dst_host "
        f"FROM uedges)",
        "hw AS MATERIALIZED (SELECT src_host, dst_host, "
        "count(*) AS weight FROM hedges WHERE src_host <> dst_host "
        "GROUP BY src_host, dst_host)",
    ]


def _host_pagerank_sql(n: int, n_hosts: int, iters: int) -> str:
    """Oracle for pages_host_pagerank: host rollup → lexicographic id
    map (graph.py:id_map) → weighted fixed-iteration PageRank → ranks
    joined back to host names."""
    parts = _host_rollup_parts(n, n_hosts) + [
        "hosts AS (SELECT DISTINCT host FROM (SELECT src_host AS host "
        "FROM hw UNION ALL SELECT dst_host FROM hw))",
        "idmap AS MATERIALIZED (SELECT host, "
        "row_number() OVER (ORDER BY host) - 1 AS id FROM hosts)",
        "edges AS MATERIALIZED (SELECT s.id AS src, d.id AS dst, "
        "CAST(hw.weight AS DOUBLE) AS weight FROM hw "
        "JOIN idmap s ON hw.src_host = s.host "
        "JOIN idmap d ON hw.dst_host = d.host)",
        "nodes AS (SELECT id FROM idmap)",
        "deg AS (SELECT src, sum(weight) AS outw FROM edges "
        "WHERE weight > 0 GROUP BY src)",
        "fac AS MATERIALIZED (SELECT e.src, e.dst, e.weight / d.outw "
        "AS factor FROM edges e JOIN deg d ON e.src = d.src "
        "WHERE e.weight > 0)",
        "r0 AS (SELECT id, CAST(0.15 AS DOUBLE) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"m{i} AS (SELECT f.dst AS id, sum(r.rank * f.factor) AS msg "
            f"FROM fac f JOIN r{i-1} r ON f.src = r.id GROUP BY f.dst)")
        parts.append(
            f"r{i} AS (SELECT n.id, 0.15 + 0.85 * coalesce(m.msg, 0.0) "
            f"AS rank FROM nodes n LEFT JOIN m{i} m ON n.id = m.id)")
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT i.host AS host, round(r.rank, 6) AS rank "
            f"FROM r{iters} r JOIN idmap i ON r.id = i.id")


def _pages_edges_sql(n: int) -> str:
    """Oracle for pages_extract_edges: distinct (src_url, dst_url)."""
    return ("WITH " + ",\n".join(_pages_linklist_parts(n)) +
            "\nSELECT DISTINCT src_url, dst_url FROM plinks")


def _anchor_stats_sql(n: int) -> str:
    """Oracle for anchor_stats: the generator writes anchor text
    ``link-{k}`` at link position k (sources/pages.py:_rows_for_indices),
    so the SQL replay derives every (dst_url, anchor) pair from the
    arithmetic link list (duplicates preserved) and rolls up with the
    same struct-min top pick as the Spark aggregate — ties go to the
    lexicographically smaller anchor on BOTH sides."""
    return (
        "WITH " + ",\n".join(_pages_linklist_parts(n)) + ",\n"
        "al AS (SELECT dst_url, 'link-' || CAST(link_pos AS VARCHAR) "
        "AS anchor FROM plinks),\n"
        "agg AS (SELECT dst_url, anchor, count(*) AS c FROM al "
        "GROUP BY dst_url, anchor),\n"
        "roll AS (SELECT dst_url, sum(c) AS n_links, "
        "count(*) AS n_distinct_anchors, "
        "min(struct_pack(nc := -c, a := anchor)) AS t "
        "FROM agg GROUP BY dst_url)\n"
        "SELECT dst_url, CAST(n_links AS BIGINT) AS n_links, "
        "CAST(n_distinct_anchors AS BIGINT) AS n_distinct_anchors, "
        "t.a AS top_anchor, CAST(-t.nc AS BIGINT) AS top_count FROM roll"
    )


def _pages_pagerank_sql(n: int, max_iters: int, tol: float,
                        block: int) -> str:
    """Oracle for pages_pagerank_e2e: SQL link list → dense id map
    (row_number over url order, matching graph.py:id_map) → tolerance-
    convergence PageRank."""
    prefix = _pages_linklist_parts(n) + [
        "uedges AS MATERIALIZED (SELECT DISTINCT src_url, dst_url "
        "FROM plinks)",
        "urls AS (SELECT DISTINCT url FROM (SELECT src_url AS url "
        "FROM uedges UNION ALL SELECT dst_url FROM uedges))",
        "idmap AS MATERIALIZED (SELECT url, "
        "row_number() OVER (ORDER BY url) - 1 AS id FROM urls)",
        "edges AS MATERIALIZED (SELECT s.id AS src, d.id AS dst "
        "FROM uedges e JOIN idmap s ON e.src_url = s.url "
        "JOIN idmap d ON e.dst_url = d.url)",
        "nodes AS MATERIALIZED (SELECT id FROM idmap)",
    ]
    return _pagerank_tolerance_unrolled_sql(max_iters, tol, block,
                                            prefix=prefix)


def _batch_ppr_unrolled_sql(iters: int, source_sets: list[list[int] | None],
                            final_select: str | None = None,
                            extra_ctes: list[str] | None = None,
                            reverse: bool = False) -> str:
    """Unrolled batch personalized PageRank — S rank columns per CTE
    level, each column the exact _ppr_unrolled_sql recurrence for its
    teleport set (operators/pagerank.py:pagerank_batch_personalized).
    A ``None`` set = global teleport (the spam_mass register).
    ``final_select`` overrides the trailing SELECT (CTEs end at
    ``r{iters}``); ``extra_ctes`` are appended after the recurrence
    (they can reference ``r{iters}``) — the sweep-cut oracle composes
    its conductance scan this way."""
    S = len(source_sets)
    bases = []
    for ss in source_sets:
        if ss is None:
            bases.append("0.15")
        else:
            ids = ", ".join(str(x) for x in ss)
            bases.append(f"CASE WHEN id IN ({ids}) THEN 0.15 ELSE 0.0 END")
    # reverse=True transposes the walk (Anti-TrustRank: distrust flows
    # against the link direction); nodes stay the original vertex set
    etab = "tedges" if reverse else "edges"
    parts = [_EDGES_CTE, _NODES_CTE]
    if reverse:
        parts.append("tedges AS (SELECT dst AS src, src AS dst FROM edges)")
    parts += [
        f"deg AS (SELECT src, count(*) AS outd FROM {etab} GROUP BY src)",
        f"fac AS (SELECT e.src, e.dst, 1.0 / d.outd AS factor "
        f"FROM {etab} e JOIN deg d ON e.src = d.src)",
        "r0 AS MATERIALIZED (SELECT id, "
        + ", ".join(f"CAST({bases[s]} AS DOUBLE) AS r{s}" for s in range(S))
        + " FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT f.dst AS id, "
            + ", ".join(f"sum(r.r{s} * f.factor) AS m{s}" for s in range(S))
            + f" FROM fac f JOIN r{i-1} r ON f.src = r.id GROUP BY f.dst)"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT n.id, "
            + ", ".join(
                f"{bases[s].replace('id', 'n.id')} + 0.85 * "
                f"coalesce(m.m{s}, 0.0) AS r{s}" for s in range(S))
            + f" FROM nodes n LEFT JOIN m{i} m ON n.id = m.id)"
        )
    parts += extra_ctes or []
    tail = final_select or (
        "SELECT id, "
        + ", ".join(f"round(r{s}, 6) AS r{s}" for s in range(S))
        + f" FROM r{iters}"
    )
    return "WITH " + ",\n".join(parts) + "\n" + tail


def _spam_mass_sql(iters: int, trusted: list[int]) -> str:
    """Oracle for spam_mass: 2-register batch PPR (global + trusted)
    then the rescale arithmetic (operators/pagerank.py:spam_mass)."""
    final = (
        f"SELECT id, round(r0, 6) AS pagerank, "
        f"round(r1 * (SELECT sum(r0) / sum(r1) FROM r{iters}), 6) AS trust, "
        f"round((r0 - r1 * (SELECT sum(r0) / sum(r1) FROM r{iters})) / r0, 6)"
        f" + 0.0 AS spam_mass_rel FROM r{iters}"
    )
    return _batch_ppr_unrolled_sql(iters, [None, trusted],
                                   final_select=final)


def _ppr_unrolled_sql(iters: int, sources: list[int]) -> str:
    """Personalized PageRank: the 0.15 base term only at ``sources``
    (operators/pagerank.py:_init_ranks source_ids branch)."""
    src = ", ".join(str(s) for s in sources)
    base = f"CASE WHEN id IN ({src}) THEN 0.15 ELSE 0.0 END"
    parts = [
        _EDGES_CTE, _NODES_CTE,
        "deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src)",
        "fac AS (SELECT e.src, e.dst, 1.0 / d.outd AS factor "
        "FROM edges e JOIN deg d ON e.src = d.src)",
        f"r0 AS MATERIALIZED (SELECT id, CAST({base} AS DOUBLE) AS rank "
        f"FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT f.dst AS id, "
            f"sum(r.rank * f.factor) AS msg "
            f"FROM fac f JOIN r{i-1} r ON f.src = r.id GROUP BY f.dst)"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT n.id, "
            f"{base.replace('id', 'n.id')} + 0.85 * coalesce(m.msg, 0.0) "
            f"AS rank FROM nodes n LEFT JOIN m{i} m ON n.id = m.id)"
        )
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT id, round(rank, 6) AS rank FROM r{iters}")


def _lpa_unrolled_sql(iters: int) -> str:
    """Unrolled red-black semi-synchronous LPA (matches
    operators/labelprop.py): each iteration updates even-id listeners
    first against the previous labels, then odd-id listeners against
    the refreshed labels. Node v adopts the argmax label among its
    OUT-neighbors (votes = edge count, tie-break smallest label); nodes
    with no out-edges keep their label. Seeds = own id."""
    parts = [_EDGES_CTE, _NODES_CTE,
             "l0b AS MATERIALIZED (SELECT id, id AS label FROM nodes)"]
    # MATERIALIZED: each label CTE is referenced twice (vote join +
    # carry-forward base) — DuckDB's default inlining doubles the plan
    # per phase, 2^(2*iters) overall
    for i in range(1, iters + 1):
        prev = f"l{i-1}b"
        for phase, parity in (("a", 0), ("b", 1)):
            src_l = prev if phase == "a" else f"l{i}a"
            parts.append(
                f"v{i}{phase} AS MATERIALIZED (SELECT e.src AS id, l.label, "
                f"count(*) AS votes "
                f"FROM edges e JOIN {src_l} l ON l.id = e.dst "
                f"WHERE e.src % 2 = {parity} GROUP BY e.src, l.label)"
            )
            parts.append(
                f"w{i}{phase} AS MATERIALIZED (SELECT id, label, row_number() OVER "
                f"(PARTITION BY id ORDER BY votes DESC, label ASC) AS rn "
                f"FROM v{i}{phase})"
            )
            parts.append(
                f"l{i}{phase} AS MATERIALIZED (SELECT p.id, "
                f"coalesce(w.label, p.label) AS label "
                f"FROM {src_l} p "
                f"LEFT JOIN (SELECT id, label FROM w{i}{phase} WHERE rn = 1) w "
                f"ON p.id = w.id)"
            )
    return "WITH " + ",\n".join(parts) + f"\nSELECT id, label FROM l{iters}b"


def _lpa_seeded_unrolled_sql(iters: int) -> str:
    """Seeded + weighted LPA unroll — the reference's 'partition' seed
    and 'weight' node-property semantics (LabelPropagation.java:45-51,
    221-228) over the multiplicity-weighted edge table: seed label =
    id % 7 on every third node (else own id), vote weight = edge
    multiplicity × voter node weight (1 + id % 4). Vote sums are
    integer-valued doubles, so the argmax order is exact in both
    engines. Same red-black phase structure as _lpa_unrolled_sql."""
    parts = [
        _WEDGES_CTE,
        "nodes AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM wedges UNION ALL SELECT dst FROM wedges))",
        "nw AS MATERIALIZED (SELECT id, CAST(1 + id % 4 AS DOUBLE) AS w "
        "FROM nodes)",
        "l0b AS MATERIALIZED (SELECT id, "
        "CASE WHEN id % 3 = 0 THEN id % 7 ELSE id END AS label "
        "FROM nodes)",
    ]
    for i in range(1, iters + 1):
        prev = f"l{i-1}b"
        for phase, parity in (("a", 0), ("b", 1)):
            src_l = prev if phase == "a" else f"l{i}a"
            parts.append(
                f"v{i}{phase} AS MATERIALIZED (SELECT e.src AS id, l.label, "
                f"sum(e.weight * nw.w) AS votes "
                f"FROM wedges e JOIN {src_l} l ON l.id = e.dst "
                f"JOIN nw ON nw.id = e.dst "
                f"WHERE e.src % 2 = {parity} GROUP BY e.src, l.label)"
            )
            parts.append(
                f"w{i}{phase} AS MATERIALIZED (SELECT id, label, row_number() OVER "
                f"(PARTITION BY id ORDER BY votes DESC, label ASC) AS rn "
                f"FROM v{i}{phase})"
            )
            parts.append(
                f"l{i}{phase} AS MATERIALIZED (SELECT p.id, "
                f"coalesce(w.label, p.label) AS label "
                f"FROM {src_l} p "
                f"LEFT JOIN (SELECT id, label FROM w{i}{phase} WHERE rn = 1) w "
                f"ON p.id = w.id)"
            )
    return "WITH " + ",\n".join(parts) + f"\nSELECT id, label FROM l{iters}b"


def _articlerank_unrolled_sql(iters: int) -> str:
    """ArticleRank: PageRank loop with factor 1/(outDeg + avgOutDeg)
    (ArticleRankComputeStep.java)."""
    parts = [
        _EDGES_CTE, _NODES_CTE,
        "deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src)",
        "avgd AS (SELECT avg(outd) AS a FROM deg)",
        "fac AS (SELECT e.src, e.dst, 1.0 / (d.outd + (SELECT a FROM avgd)) AS factor "
        "FROM edges e JOIN deg d ON e.src = d.src)",
        "r0 AS (SELECT id, CAST(0.15 AS DOUBLE) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"m{i} AS (SELECT f.dst AS id, sum(r.rank * f.factor) AS msg "
            f"FROM fac f JOIN r{i-1} r ON f.src = r.id GROUP BY f.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT n.id, 0.15 + 0.85 * coalesce(m.msg, 0.0) AS rank "
            f"FROM nodes n LEFT JOIN m{i} m ON n.id = m.id)"
        )
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT id, round(rank, 6) AS score FROM r{iters}")


def _eigenvector_unrolled_sql(iters: int, norm: str = "max") -> str:
    """Unrolled power iteration with per-iteration L2 normalization and
    final max-normalization — mirrors
    operators/centrality_variants.py:eigenvector_centrality (reference
    EigenvectorCentralityComputeStep.java + Normalization.java:19-35).
    Deterministic at fixed iterations, so the loop unrolls into chained
    CTEs; the L2 norm is a scalar subquery per iteration. Every
    per-iteration CTE is MATERIALIZED: DuckDB inlines plain CTEs, and a
    chain whose levels are each referenced twice (raw{i} feeds both the
    L2 scalar and r{i}) would otherwise expand exponentially."""
    parts = [
        _EDGES_CTE, _NODES_CTE,
        "r0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT count(*) FROM nodes)"
        " AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT e.dst AS id, sum(r.rank) AS msg "
            f"FROM edges e JOIN r{i-1} r ON r.id = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"raw{i} AS MATERIALIZED (SELECT n.id, coalesce(m.msg, 0.0) AS raw "
            f"FROM nodes n LEFT JOIN m{i} m ON n.id = m.id)"
        )
        parts.append(
            f"l2_{i} AS MATERIALIZED (SELECT CASE WHEN sqrt(sum(raw * raw)) > 0 "
            f"THEN sqrt(sum(raw * raw)) ELSE 1.0 END AS v FROM raw{i})"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT id, raw / (SELECT v FROM l2_{i}) "
            f"AS rank FROM raw{i})"
        )
    final = {
        "max": f"(SELECT max(rank) FROM r{iters})",
        "l1norm": f"(SELECT sum(rank) FROM r{iters})",
    }[norm]
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, round(rank / {final}, 6)"
        f" AS score FROM r{iters}"
    )


def _hits_unrolled_sql(iters: int) -> str:
    """Unrolled HITS (Kleinberg): per iteration an authority half-step
    (auth = A^T.hub, L2-normalize) then a hub half-step (hub = A.auth,
    L2-normalize) — mirrors operators/centrality_variants.py:hits.
    Deterministic at fixed iterations; every per-step CTE MATERIALIZED
    for the same reason as _eigenvector_unrolled_sql."""
    parts = [
        _EDGES_CTE, _NODES_CTE,
        "s0 AS MATERIALIZED (SELECT id, "
        "1.0 / (SELECT count(*) FROM nodes) AS hub, "
        "1.0 / (SELECT count(*) FROM nodes) AS auth FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"am{i} AS MATERIALIZED (SELECT e.dst AS id, sum(s.hub) AS araw "
            f"FROM edges e JOIN s{i-1} s ON s.id = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"araw{i} AS MATERIALIZED (SELECT s.id, s.hub, "
            f"coalesce(a.araw, 0.0) AS araw "
            f"FROM s{i-1} s LEFT JOIN am{i} a ON s.id = a.id)"
        )
        parts.append(
            f"al2_{i} AS MATERIALIZED (SELECT CASE WHEN sqrt(sum(araw * araw)) > 0 "
            f"THEN sqrt(sum(araw * araw)) ELSE 1.0 END AS v FROM araw{i})"
        )
        parts.append(
            f"mid{i} AS MATERIALIZED (SELECT id, hub, "
            f"araw / (SELECT v FROM al2_{i}) AS auth FROM araw{i})"
        )
        parts.append(
            f"hm{i} AS MATERIALIZED (SELECT e.src AS id, sum(m.auth) AS hraw "
            f"FROM edges e JOIN mid{i} m ON m.id = e.dst GROUP BY e.src)"
        )
        parts.append(
            f"hraw{i} AS MATERIALIZED (SELECT m.id, m.auth, "
            f"coalesce(h.hraw, 0.0) AS hraw "
            f"FROM mid{i} m LEFT JOIN hm{i} h ON m.id = h.id)"
        )
        parts.append(
            f"hl2_{i} AS MATERIALIZED (SELECT CASE WHEN sqrt(sum(hraw * hraw)) > 0 "
            f"THEN sqrt(sum(hraw * hraw)) ELSE 1.0 END AS v FROM hraw{i})"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT id, "
            f"hraw / (SELECT v FROM hl2_{i}) AS hub, auth FROM hraw{i})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, round(hub, 6) AS hub, round(auth, 6) AS authority "
        f"FROM s{iters}"
    )


def _salsa_rounds_sql(iters: int, *, tag: str = "s",
                      edges: str = "edges",
                      nodes: str = "nodes") -> list[str]:
    """CTE chain for unrolled SALSA on arbitrary edge/node CTEs —
    final state is ``{tag}{iters}`` with (id, hub, auth). MATERIALIZED
    for the same chain-inlining reason as _hits_unrolled_sql. Shared
    by the full-graph oracle (_salsa_unrolled_sql) and the WTF
    composition (bipartite circle subgraph)."""
    t = tag
    parts = [
        f"{t}od AS MATERIALIZED (SELECT src AS id, count(*) AS outd "
        f"FROM {edges} GROUP BY src)",
        f"{t}id AS MATERIALIZED (SELECT dst AS id, count(*) AS ind "
        f"FROM {edges} GROUP BY dst)",
        f"{t}0 AS MATERIALIZED (SELECT id, "
        f"1.0 / (SELECT count(*) FROM {nodes}) AS hub, "
        f"1.0 / (SELECT count(*) FROM {nodes}) AS auth FROM {nodes})",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"{t}hm{i} AS MATERIALIZED (SELECT e.src AS id, "
            f"sum(s.auth / d.ind) AS hraw "
            f"FROM {edges} e JOIN {t}{i-1} s ON s.id = e.dst "
            f"JOIN {t}id d ON d.id = e.dst GROUP BY e.src)"
        )
        parts.append(
            f"{t}hraw{i} AS MATERIALIZED (SELECT s.id, "
            f"coalesce(h.hraw, 0.0) AS hraw, s.auth "
            f"FROM {t}{i-1} s LEFT JOIN {t}hm{i} h ON s.id = h.id)"
        )
        parts.append(
            f"{t}hl1_{i} AS MATERIALIZED (SELECT CASE "
            f"WHEN sum(abs(hraw)) > 0 "
            f"THEN sum(abs(hraw)) ELSE 1.0 END AS v FROM {t}hraw{i})"
        )
        parts.append(
            f"{t}mid{i} AS MATERIALIZED (SELECT id, "
            f"hraw / (SELECT v FROM {t}hl1_{i}) AS hub, auth "
            f"FROM {t}hraw{i})"
        )
        parts.append(
            f"{t}am{i} AS MATERIALIZED (SELECT e.dst AS id, "
            f"sum(m.hub / d.outd) AS araw "
            f"FROM {edges} e JOIN {t}mid{i} m ON m.id = e.src "
            f"JOIN {t}od d ON d.id = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"{t}araw{i} AS MATERIALIZED (SELECT m.id, m.hub, "
            f"coalesce(a.araw, 0.0) AS araw "
            f"FROM {t}mid{i} m LEFT JOIN {t}am{i} a ON m.id = a.id)"
        )
        parts.append(
            f"{t}al1_{i} AS MATERIALIZED (SELECT CASE "
            f"WHEN sum(abs(araw)) > 0 "
            f"THEN sum(abs(araw)) ELSE 1.0 END AS v FROM {t}araw{i})"
        )
        parts.append(
            f"{t}{i} AS MATERIALIZED (SELECT id, hub, "
            f"araw / (SELECT v FROM {t}al1_{i}) AS auth FROM {t}araw{i})"
        )
    return parts


def _salsa_unrolled_sql(iters: int) -> str:
    """Unrolled SALSA (Lempel & Moran): per iteration a degree-normalized
    hub half-step (hub = A·(auth/in_deg), L1-normalize) then authority
    half-step (auth = Aᵀ·(hub/out_deg), L1-normalize) — mirrors
    operators/centrality_variants.py:salsa."""
    parts = [_EDGES_CTE, _NODES_CTE]
    parts += _salsa_rounds_sql(iters)
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, round(hub, 6) AS hub, round(auth, 6) AS authority "
        f"FROM s{iters}"
    )


def _sssp_unrolled_sql(iters: int) -> str:
    """Unrolled Bellman-Ford from node 0 over the multiplicity-weighted
    graph — mirrors operators/traversal.py:sssp (reference
    ShortestPathDeltaStepping.java). Each CTE pair is one relaxation
    round (min over incoming cost+weight vs the standing cost, NULL =
    unreached); with all weights >= 1 and unweighted diameter ~5 the
    optimal hop count is far below ``iters``, so the fixed unroll
    reaches the same fixpoint the Spark loop converges to. CTEs are
    MATERIALIZED — each d{{i}} is referenced twice (by c{{i+1}} and
    d{{i+1}}) and DuckDB's default inlining would expand the chain
    exponentially (measured: 'too many open files' at 20 levels)."""
    parts = [
        _WEDGES_CTE,
        "nodes AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM wedges UNION ALL SELECT dst FROM wedges))",
        "d0 AS MATERIALIZED (SELECT id, CASE WHEN id = 0 THEN 0.0 END "
        "AS cost FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS id, "
            f"min(d.cost + e.weight) AS c "
            f"FROM wedges e JOIN d{i-1} d ON d.id = e.src "
            f"WHERE d.cost IS NOT NULL GROUP BY e.dst)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT p.id, "
            f"CASE WHEN p.cost IS NULL THEN c.c "
            f"     WHEN c.c IS NULL THEN p.cost "
            f"     WHEN c.c < p.cost THEN c.c ELSE p.cost END AS cost "
            f"FROM d{i-1} p LEFT JOIN c{i} c ON p.id = c.id)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, round(cost, 6) AS cost FROM d{iters} "
        "WHERE cost IS NOT NULL"
    )


def _allsp_unrolled_sql(iters: int, n_sub: int = 60) -> str:
    """Unrolled MULTI-source Bellman-Ford over the weighted induced
    id<n_sub subgraph — mirrors operators/traversal.py:all_shortest_paths
    (reference impl/AllShortestPaths.java:220, Dijkstra per node).
    MATERIALIZED CTEs for the same exponential-inlining reason as
    ``_sssp_unrolled_sql``."""
    parts = [
        _WEDGES_CTE,
        f"swedges AS MATERIALIZED (SELECT * FROM wedges "
        f"WHERE src < {n_sub} AND dst < {n_sub})",
        "snodes AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM swedges UNION ALL SELECT dst FROM swedges))",
        "d0 AS MATERIALIZED (SELECT a.id AS source, b.id AS id, "
        "CASE WHEN a.id = b.id THEN 0.0 END AS cost "
        "FROM snodes a CROSS JOIN snodes b)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT d.source, e.dst AS id, "
            f"min(d.cost + e.weight) AS c "
            f"FROM swedges e JOIN d{i-1} d ON d.id = e.src "
            f"WHERE d.cost IS NOT NULL GROUP BY d.source, e.dst)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT p.source, p.id, "
            f"CASE WHEN p.cost IS NULL THEN c.c "
            f"     WHEN c.c IS NULL THEN p.cost "
            f"     WHEN c.c < p.cost THEN c.c ELSE p.cost END AS cost "
            f"FROM d{i-1} p LEFT JOIN c{i} c "
            f"ON p.source = c.source AND p.id = c.id)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT source, id, round(cost, 6) AS cost FROM d{iters} "
        "WHERE cost IS NOT NULL"
    )


# induced-subgraph CTEs for the closeness-family / SCC oracles
def _sub_cte(n: int) -> str:
    return (
        f"sub AS (SELECT DISTINCT l_orderkey % {N_MOD} AS src, "
        f"l_partkey % {N_MOD} AS dst FROM lineitem "
        f"WHERE l_orderkey % {N_MOD} < {n} AND l_partkey % {N_MOD} < {n})"
    )


_SNODES_CTE = (
    "snodes AS (SELECT DISTINCT id FROM "
    "(SELECT src AS id FROM sub UNION ALL SELECT dst FROM sub))"
)

# all-pairs BFS distances over `sub` (depth-bounded walk closure; the
# induced graph's diameter is ≤ 5, bound 10 leaves slack)
_APSP_CTE = """
 r(s, v, d) AS (
   SELECT src, dst, 1 FROM sub WHERE src <> dst
   UNION
   SELECT r.s, e.dst, r.d + 1 FROM r JOIN sub e ON e.src = r.v
   WHERE r.d < 10 AND e.dst <> r.s
 ),
 dist AS (SELECT s, v, min(d) AS d FROM r GROUP BY s, v)
"""


def _closeness_sql(wf: bool) -> str:
    formula = "CAST(coalesce(c.component, 0) AS DOUBLE) / f.farness"
    if wf:
        formula = (
            f"({formula}) * ((coalesce(c.component, 0) - 1.0) / "
            "((SELECT count(*) FROM snodes) - 1.0))"
        )
    return f"""
        WITH RECURSIVE {_sub_cte(200)}, {_SNODES_CTE}, {_APSP_CTE}
        , farn AS (SELECT v AS id, sum(d) AS farness FROM dist GROUP BY v)
        , comp AS (SELECT s AS id, count(*) AS component FROM dist GROUP BY s)
        SELECT n.id,
               round(CASE WHEN coalesce(f.farness, 0) = 0 THEN 0.0
                     ELSE {formula} END, 6) AS centrality
        FROM snodes n
        LEFT JOIN farn f ON n.id = f.id
        LEFT JOIN comp c ON n.id = c.id
    """


_HARMONIC_SQL = f"""
    WITH RECURSIVE {_sub_cte(200)},
    both_dir AS (SELECT src, dst FROM sub
                 UNION SELECT dst, src FROM sub),
    {_SNODES_CTE},
    r(s, v, d) AS (
      SELECT src, dst, 1 FROM both_dir WHERE src <> dst
      UNION
      SELECT r.s, e.dst, r.d + 1 FROM r JOIN both_dir e ON e.src = r.v
      WHERE r.d < 10 AND e.dst <> r.s
    ),
    dist AS (SELECT s, v, min(d) AS d FROM r GROUP BY s, v),
    inv AS (SELECT v AS id,
                   sum(1.0 / d) / ((SELECT count(*) FROM snodes) - 1.0) AS c
            FROM dist GROUP BY v)
    SELECT n.id, round(coalesce(i.c, 0.0), 6) AS centrality
    FROM snodes n LEFT JOIN inv i ON n.id = i.id
"""

_DANGALCHEV_SQL = f"""
    WITH RECURSIVE {_sub_cte(200)}, {_SNODES_CTE}, {_APSP_CTE}
    , sc AS (SELECT v AS id, sum(pow(2.0, -d)) AS c FROM dist GROUP BY v)
    SELECT n.id, round(coalesce(sc.c, 0.0), 6) AS centrality
    FROM snodes n LEFT JOIN sc ON n.id = sc.id
"""

_SCC_SQL = f"""
    WITH RECURSIVE {_sub_cte(300)}, {_SNODES_CTE},
    r(u, v) AS (
      SELECT src, dst FROM sub WHERE src <> dst
      UNION
      SELECT r.u, e.dst FROM r JOIN sub e ON e.src = r.v WHERE e.dst <> r.u
    ),
    mut AS (SELECT a.u AS id, a.v AS o FROM r a
            JOIN r b ON b.u = a.v AND b.v = a.u),
    allm AS (SELECT id, o FROM mut
             UNION ALL SELECT id, id FROM snodes)
    SELECT id, min(o) AS component FROM allm GROUP BY id
"""

_SIGN = (
    "(CASE WHEN ({a} + {b}) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
)
_BALANCED_SQL = f"""
    WITH {_EDGES_CTE}, {_NODES_CTE}, {_CANON_CTE}, {_TRI_CTE},
    signed AS (
      SELECT a, b, c,
             CASE WHEN {_SIGN.format(a='a', b='b')}
                  * {_SIGN.format(a='b', b='c')}
                  * {_SIGN.format(a='a', b='c')} >= 0.0
                  THEN 1 ELSE 0 END AS bal
      FROM tri),
    corners AS (SELECT a AS id, bal FROM signed
                UNION ALL SELECT b, bal FROM signed
                UNION ALL SELECT c, bal FROM signed),
    pern AS (SELECT id, CAST(sum(bal) AS BIGINT) AS balanced,
                    CAST(sum(1 - bal) AS BIGINT) AS unbalanced
             FROM corners GROUP BY id)
    SELECT n.id, coalesce(p.balanced, 0) AS balanced,
           coalesce(p.unbalanced, 0) AS unbalanced
    FROM nodes n LEFT JOIN pern p ON n.id = p.id
"""

_EMB40_CTE = (
    "base AS (SELECT vec_id AS item, embedding::DOUBLE[] AS v "
    "FROM embeddings WHERE vec_id < 40)"
)

_EUCLIDEAN_SQL = f"""
    WITH {_EMB40_CTE}
    SELECT a.item AS item1, b.item AS item2,
           round(list_distance(a.v, b.v), 5) AS distance
    FROM base a JOIN base b ON a.item < b.item
"""

_PEARSON_SQL = f"""
    WITH {_EMB40_CTE},
    stats AS (SELECT item, v, len(v) AS n,
                     list_aggregate(v, 'sum') AS s,
                     list_dot_product(v, v) AS q
              FROM base)
    SELECT a.item AS item1, b.item AS item2,
           round((list_dot_product(a.v, b.v) - a.s * b.s / a.n)
                 / sqrt((a.q - a.s * a.s / a.n) * (b.q - b.s * b.s / b.n)),
                 5) + 0.0 AS similarity
    FROM stats a JOIN stats b ON a.item < b.item
"""

_WCC_SQL = f"""
WITH RECURSIVE {_EDGES_CTE},
 sym AS (SELECT src, dst FROM edges WHERE src <> dst
         UNION SELECT dst, src FROM edges WHERE src <> dst),
 {_NODES_CTE},
 r(id, comp) AS (
   SELECT id, id FROM nodes
   UNION
   SELECT sym.dst, r.comp FROM r JOIN sym ON sym.src = r.id AND sym.dst <> r.comp
 )
SELECT id, min(comp) AS component FROM r GROUP BY id
"""

_WCC_STATS_SQL = f"""
WITH RECURSIVE {_EDGES_CTE},
 sym AS (SELECT src, dst FROM edges WHERE src <> dst
         UNION SELECT dst, src FROM edges WHERE src <> dst),
 {_NODES_CTE},
 r(id, comp) AS (
   SELECT id, id FROM nodes
   UNION
   SELECT sym.dst, r.comp FROM r JOIN sym ON sym.src = r.id AND sym.dst <> r.comp
 ),
 comps AS (SELECT id, min(comp) AS component FROM r GROUP BY id),
 sizes AS (SELECT component, count(*) AS sz FROM comps GROUP BY component)
SELECT CAST(sum(sz) AS BIGINT) AS n_nodes,
       CAST(count(*) AS BIGINT) AS n_communities,
       CAST(min(sz) AS BIGINT) AS min_size,
       round(quantile_cont(sz, 0.25), 6) AS p25,
       round(quantile_cont(sz, 0.5), 6) AS p50,
       round(quantile_cont(sz, 0.75), 6) AS p75,
       round(quantile_cont(sz, 0.9), 6) AS p90,
       round(quantile_cont(sz, 0.95), 6) AS p95,
       round(quantile_cont(sz, 0.99), 6) AS p99,
       CAST(max(sz) AS BIGINT) AS max_size
FROM sizes
"""

_WCC_TH_SQL = f"""
WITH RECURSIVE {_WEDGES_CTE},
 fedges AS (SELECT src, dst FROM wedges WHERE weight >= 2.0),
 sym AS (SELECT src, dst FROM fedges WHERE src <> dst
         UNION SELECT dst, src FROM fedges WHERE src <> dst),
 nodes AS (SELECT DISTINCT id FROM
   (SELECT src AS id FROM wedges UNION ALL SELECT dst FROM wedges)),
 r(id, comp) AS (
   SELECT id, id FROM nodes
   UNION
   SELECT sym.dst, r.comp FROM r JOIN sym ON sym.src = r.id AND sym.dst <> r.comp
 )
SELECT id, min(comp) AS component FROM r GROUP BY id
"""


# ---------------------------------------------------------------------------
# Spark-side query callables
# ---------------------------------------------------------------------------


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    res = pagerank(_vertices(e), e, max_iterations=PR_ITERS, tol=0.0)
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def _q_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with dangling-mass redistribution (the standard web
    formulation; reference drops the mass — this is the extension).
    Edges are filtered to src % 3 != 0 so the graph actually HAS
    dangling vertices (334 at sf0.01; the unfiltered driver graph has
    none and the check would be vacuous)."""
    e = _edges(spark, sf_dir).filter((F.col("src") % 3) != 0)
    res = pagerank(_vertices(e), e, max_iterations=PR_ITERS, tol=0.0,
                   dangling="redistribute")
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def _pagerank_dangling_unrolled_sql(iters: int) -> str:
    """Unrolled redistribute-variant oracle: per iteration the message
    aggregation PLUS the dangling-mass scalar s{i}, crossed into the
    rank update exactly as the operator's in-plan 1-row aggregate.
    r{i} is referenced twice per round (m{i+1} and s{i+1}) —
    MATERIALIZED, or DuckDB re-inlines the whole chain per reference."""
    parts = [
        _EDGES_CTE.replace("FROM lineitem",
                           "FROM lineitem "
                           "WHERE (l_orderkey % 1000) % 3 <> 0"),
        _NODES_CTE,
        "deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src)",
        "fac AS MATERIALIZED (SELECT e.src, e.dst, 1.0 / d.outd AS factor "
        "FROM edges e JOIN deg d ON e.src = d.src)",
        "nc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "dang AS MATERIALIZED (SELECT n.id FROM nodes n "
        "LEFT JOIN deg d ON d.src = n.id WHERE d.src IS NULL)",
        "r0 AS MATERIALIZED (SELECT id, CAST(0.15 AS DOUBLE) AS rank "
        "FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"m{i} AS (SELECT f.dst AS id, sum(r.rank * f.factor) AS msg "
            f"FROM fac f JOIN r{i-1} r ON f.src = r.id GROUP BY f.dst)")
        parts.append(
            f"s{i} AS (SELECT coalesce(sum(r.rank), 0.0) AS ds "
            f"FROM r{i-1} r JOIN dang d ON d.id = r.id)")
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT n.id, 0.15 + 0.85 * "
            f"(coalesce(m.msg, 0.0) + s.ds / nc.n) AS rank "
            f"FROM nodes n LEFT JOIN m{i} m ON n.id = m.id "
            f"CROSS JOIN s{i} s CROSS JOIN nc)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT id, round(rank, 6) AS rank FROM r{iters}")


def _q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges_weighted(spark, sf_dir)
    res = pagerank(_vertices(e), e, max_iterations=PR_ITERS, tol=0.0, weighted=True)
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def _q_pagerank_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    res = pagerank(_vertices(e), e, max_iterations=PR_ITERS, tol=0.0,
                   strategy="csr")
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def _q_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    res = pagerank(_vertices(e), e, max_iterations=PR_ITERS, tol=0.0)
    return (
        res.ranks.select("id", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(20)
    )


def _q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: the teleport/base term lives only at
    source nodes 0..9 (PageRank.java sourceNodeIds)."""
    e = _edges(spark, sf_dir)
    res = pagerank(_vertices(e), e, max_iterations=PR_ITERS, tol=0.0,
                   source_ids=range(10))
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


BATCH_PPR_SETS = [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9], [10, 11, 12, 13, 14]]


def _q_pagerank_batch_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch personalized PageRank: 3 teleport sets ride one superstep
    loop (register-column pattern — ONE edge join + ONE aggregation per
    superstep for all sets). Oracle unrolls the same recurrence with 3
    rank columns per CTE level."""
    from neo4j_graph_algorithms_spark.operators.pagerank import (
        pagerank_batch_personalized,
    )

    e = _edges(spark, sf_dir)
    res = pagerank_batch_personalized(
        _vertices(e), e, BATCH_PPR_SETS, max_iterations=PR_ITERS, tol=0.0)
    return res.ranks.select(
        "id", *[F.round(f"r{s}", 6).alias(f"r{s}") for s in range(3)])


SWEEP_SEEDS = [0, 1, 2, 3, 4]


def _q_ppr_sweep_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPR-Nibble sweep (operators/local_cluster.py — Andersen-Chung-
    Lang local clustering): 10-iteration personalized PageRank from 5
    seeds, vertices ordered by quantized score/degree, conductance of
    every sweep prefix via distributed prefix sums (plans/ranking.py —
    range repartition + per-partition offsets, no single-partition
    window). Oracle replays the batch-PPR recurrence then the identical
    sweep with SQL window cumsums; the round(·,6) quantization of the
    ordering key makes the sweep order integer-exact cross-engine."""
    from neo4j_graph_algorithms_spark.operators.local_cluster import (
        sweep_cut,
    )
    from neo4j_graph_algorithms_spark.operators.pagerank import (
        pagerank_batch_personalized,
    )

    e = _edges(spark, sf_dir)
    res = pagerank_batch_personalized(
        _vertices(e), e, [SWEEP_SEEDS], max_iterations=PR_ITERS, tol=0.0)
    scores = res.ranks.select("id", F.col("r0").alias("score"))
    return sweep_cut(e, scores, quantize=6)


def _ppr_sweep_cut_sql(iters: int, seeds: list[int]) -> str:
    """Sweep-cut conductance scan composed onto the unrolled batch-PPR
    recurrence: undirected simple graph, support = quantized score > 0,
    difference-array cut counts (+1 at the lower sweep position, −1 at
    the higher; no −1 when the far endpoint is outside the support),
    window cumsums for volume and cut."""
    extra = [
        "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM edges WHERE src <> dst)",
        "sdeg AS (SELECT id, count(*) AS deg FROM "
        "(SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und) "
        "GROUP BY id)",
        "sm2 AS (SELECT 2.0 * count(*) AS m2 FROM und)",
        f"sup AS (SELECT r.id, round(r.r0, 6) AS s, d.deg "
        f"FROM r{iters} r JOIN sdeg d ON r.id = d.id "
        "WHERE round(r.r0, 6) > 0)",
        "rk AS MATERIALIZED (SELECT id, deg, "
        "row_number() OVER (ORDER BY s / deg DESC, id) AS pos FROM sup)",
        "prs AS (SELECT ra.pos AS pa, rb.pos AS pb FROM und u "
        "LEFT JOIN rk ra ON u.a = ra.id LEFT JOIN rk rb ON u.b = rb.id "
        "WHERE ra.pos IS NOT NULL OR rb.pos IS NOT NULL)",
        "ev AS (SELECT pos, sum(delta) AS delta FROM ("
        "SELECT CASE WHEN pa IS NULL THEN pb WHEN pb IS NULL THEN pa "
        "WHEN pa < pb THEN pa ELSE pb END AS pos, 1 AS delta FROM prs "
        "UNION ALL "
        "SELECT CASE WHEN pa < pb THEN pb ELSE pa END AS pos, -1 AS delta "
        "FROM prs WHERE pa IS NOT NULL AND pb IS NOT NULL"
        ") GROUP BY pos)",
        "sweep AS (SELECT r.pos, r.id, "
        "sum(r.deg) OVER (ORDER BY r.pos) AS vol, "
        "sum(coalesce(e.delta, 0)) OVER (ORDER BY r.pos) AS cut "
        "FROM rk r LEFT JOIN ev e ON e.pos = r.pos)",
    ]
    final = (
        "SELECT pos, id, CAST(vol AS BIGINT) AS vol, "
        "CAST(cut AS BIGINT) AS cut, "
        "round(CAST(cut AS DOUBLE) / least(CAST(vol AS DOUBLE), "
        "(SELECT m2 FROM sm2) - vol), 6) + 0.0 AS conductance "
        "FROM sweep "
        "WHERE least(CAST(vol AS DOUBLE), (SELECT m2 FROM sm2) - vol) > 0"
    )
    return _batch_ppr_unrolled_sql(iters, [seeds],
                                   final_select=final, extra_ctes=extra)


KATZ_ITERS = 8
KATZ_ALPHA = 0.05


def _q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality (operators/centrality_variants.py:katz_centrality),
    fixed 8 iterations of x ← β + α·Aᵀx from x₀ = β·1 — engine
    extension between the reference's eigenvector centrality
    (EigenvectorCentralityProc.java) and PageRank. Oracle unrolls the
    identical recurrence."""
    from neo4j_graph_algorithms_spark.operators.centrality_variants import (
        katz_centrality,
    )

    e = _edges(spark, sf_dir)
    res = katz_centrality(_vertices(e), e, alpha=KATZ_ALPHA, beta=1.0,
                          max_iterations=KATZ_ITERS, tol=0.0)
    return res.scores.select("id", F.round("score", 6).alias("score"))


def _katz_unrolled_sql(iters: int, alpha: float) -> str:
    parts = [
        _EDGES_CTE, _NODES_CTE,
        "k0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS x FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"km{i} AS MATERIALIZED (SELECT e.dst AS id, sum(k.x) AS m "
            f"FROM edges e JOIN k{i-1} k ON e.src = k.id GROUP BY e.dst)")
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT n.id, 1.0 + {alpha!r} * "
            f"coalesce(m.m, 0.0) AS x FROM nodes n "
            f"LEFT JOIN km{i} m ON n.id = m.id)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT id, round(x, 6) AS score FROM k{iters}")


LANDMARKS = list(range(8))
LANDMARK_DEPTH = 12


def _q_landmark_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark distance estimation (operators/landmarks.py — Potamias
    et al. CIKM'09): two MS-BFS passes build the |V|·k landmark index,
    then 50 fixed query pairs are answered with the triangle-inequality
    bound min_l d(src→l)+d(l→dst) — joins only, no per-query traversal.
    Oracle replays both BFS directions as recursive CTEs and the same
    min-plus join."""
    from neo4j_graph_algorithms_spark.operators.landmarks import (
        estimate_distances,
        landmark_distance_index,
    )

    e = _edges(spark, sf_dir)
    v = _vertices(e)
    idx = landmark_distance_index(v, e, LANDMARKS,
                                  max_depth=LANDMARK_DEPTH)
    pairs = spark.range(50).select(
        F.col("id").alias("src"),
        ((F.col("id") * 37 + 11) % N_MOD).alias("dst"))
    return estimate_distances(pairs, idx)


def _landmark_distances_sql(landmarks: list[int], depth: int) -> str:
    lm_vals = ", ".join(f"({x})" for x in landmarks)
    return f"""
        WITH RECURSIVE {_EDGES_CTE},
        lm(id) AS (SELECT * FROM (VALUES {lm_vals}) t(id)),
        fw(l, v, d) AS (
          SELECT id, id, 0 FROM lm
          UNION
          SELECT fw.l, e.dst, fw.d + 1 FROM fw
          JOIN edges e ON e.src = fw.v WHERE fw.d < {depth}
        ),
        fwd AS (SELECT l, v, min(d) AS d_from FROM fw GROUP BY l, v),
        bw(l, v, d) AS (
          SELECT id, id, 0 FROM lm
          UNION
          SELECT bw.l, e.src, bw.d + 1 FROM bw
          JOIN edges e ON e.dst = bw.v WHERE bw.d < {depth}
        ),
        bwd AS (SELECT l, v, min(d) AS d_to FROM bw GROUP BY l, v),
        prs AS (SELECT i AS src, (i * 37 + 11) % {N_MOD} AS dst
                FROM range(50) t(i))
        SELECT p.src, p.dst,
               CAST(min(b.d_to + f.d_from) AS BIGINT) AS dist_est
        FROM prs p
        JOIN bwd b ON b.v = p.src
        JOIN fwd f ON f.l = b.l AND f.v = p.dst
        GROUP BY p.src, p.dst
    """


def _q_community_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community cut/volume/conductance (operators/metrics.py:
    community_conductance) over the deterministic one-level Louvain
    labels — the partition-quality YIELD surface. Oracle composes the
    conductance scan onto the unrolled Louvain rounds."""
    from neo4j_graph_algorithms_spark.operators.louvain import (
        louvain_one_level,
    )
    from neo4j_graph_algorithms_spark.operators.metrics import (
        community_conductance,
    )

    e = _sub_edges(spark, sf_dir)
    labels = louvain_one_level(_vertices(e), e, rounds=4)
    return community_conductance(e, labels)


def _community_conductance_sql(rounds: int) -> str:
    extra = [
        "cund AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM se WHERE src <> dst)",
        "cdeg AS (SELECT id, count(*) AS deg FROM "
        "(SELECT a AS id FROM cund UNION ALL SELECT b AS id FROM cund) "
        "GROUP BY id)",
        "cm2 AS (SELECT 2.0 * count(*) AS m2 FROM cund)",
        f"clab AS (SELECT id, community FROM lab{rounds})",
        "cvol AS (SELECT l.community, count(*) AS size, "
        "sum(coalesce(d.deg, 0)) AS vol FROM clab l "
        "LEFT JOIN cdeg d ON l.id = d.id GROUP BY l.community)",
        "csided AS (SELECT u.a, u.b, la.community AS ca, lb.community AS cb, "
        "CASE WHEN la.community <> lb.community THEN 1 ELSE 0 END AS x "
        "FROM cund u JOIN clab la ON u.a = la.id "
        "JOIN clab lb ON u.b = lb.id)",
        "ccut AS (SELECT community, sum(x) AS cut FROM ("
        "SELECT ca AS community, x FROM csided "
        "UNION ALL SELECT cb AS community, x FROM csided"
        ") GROUP BY community)",
    ]
    final = (
        "SELECT v.community, CAST(v.size AS BIGINT) AS size, "
        "CAST(v.vol AS BIGINT) AS vol, "
        "CAST(coalesce(c.cut, 0) AS BIGINT) AS cut, "
        "CASE WHEN least(CAST(v.vol AS DOUBLE), "
        "(SELECT m2 FROM cm2) - v.vol) > 0 THEN "
        "round(CAST(coalesce(c.cut, 0) AS DOUBLE) / "
        "least(CAST(v.vol AS DOUBLE), (SELECT m2 FROM cm2) - v.vol), 6) "
        "+ 0.0 ELSE NULL END AS conductance "
        "FROM cvol v LEFT JOIN ccut c ON v.community = c.community"
    )
    return _louvain_onelevel_sql(rounds, final_select=final,
                                 extra_ctes=extra)


def _q_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank relative spam mass (Gyöngyi et al.): global PageRank
    and trusted-seed PPR ride one 2-register superstep loop, then the
    rescale (operators/pagerank.py:spam_mass). Oracle unrolls both
    registers and the arithmetic."""
    from neo4j_graph_algorithms_spark.operators.pagerank import spam_mass

    e = _edges(spark, sf_dir)
    out = spam_mass(_vertices(e), e, list(range(20)),
                    max_iterations=PR_ITERS, tol=0.0)
    return out.select(
        "id", F.round("pagerank", 6).alias("pagerank"),
        F.round("trust", 6).alias("trust"),
        F.round("spam_mass_rel", 6).alias("spam_mass_rel"))


def _q_anti_trust_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-TrustRank (Krishnan & Raj AIRWeb'06 — operators/pagerank.py:
    anti_trust_rank): distrust PPR from 10 known-spam seeds over the
    TRANSPOSED edge table; pages that link (directly or transitively)
    to spam inherit distrust. Oracle unrolls the same recurrence over
    the transposed edge CTE."""
    from neo4j_graph_algorithms_spark.operators.pagerank import (
        anti_trust_rank,
    )

    e = _edges(spark, sf_dir)
    out = anti_trust_rank(_vertices(e), e, ANTI_TRUST_SEEDS,
                          max_iterations=PR_ITERS, tol=0.0)
    return out.select("id", F.round("anti_trust", 6).alias("anti_trust"))


ANTI_TRUST_SEEDS = list(range(900, 910))


def _q_triangle_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """algo.triangle.stream: every triangle once, node_a<node_b<node_c."""
    from neo4j_graph_algorithms_spark.operators.triangles import (
        triangle_stream,
    )

    return triangle_stream(_edges(spark, sf_dir))


def _q_pagerank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-propagation PageRank (push-style). At θ=0 and a fixed
    iteration count it is float-reorder-equal to the standard loop, so
    it shares the same unrolled-SQL oracle (values round to 6 dp before
    hashing)."""
    from neo4j_graph_algorithms_spark.operators.pagerank import (
        pagerank_delta,
    )

    e = _edges(spark, sf_dir)
    res = pagerank_delta(_vertices(e), e, max_iterations=PR_ITERS, tol=0.0)
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def _q_pagerank_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm-started re-rank after a deterministic edge drop: PR_ITERS
    fixed iterations on the base graph give prev_ranks, then PR_ITERS
    warm iterations on the perturbed graph via the standard warm-started
    loop (pagerank_incremental's default strategy='dataframe';
    _incremental_pagerank_sql replays both phases — at tol=0 the delta
    strategy reaches the same iterates, but 'dataframe' is what runs)."""
    from neo4j_graph_algorithms_spark.operators.pagerank import (
        pagerank_incremental,
    )

    e = _edges(spark, sf_dir)
    v = _vertices(e)
    prev = pagerank(v, e, max_iterations=PR_ITERS, tol=0.0)
    e1 = e.filter((F.col("src") * 31 + F.col("dst")) % 23 != 0)
    res = pagerank_incremental(v, e1, prev.ranks,
                               max_iterations=PR_ITERS, tol=0.0)
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def _q_pagerank_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # convergence-extension variant; the oracle unrolls all 100
    # iterations and replays the block-delta stopping rule
    # (_pagerank_tolerance_unrolled_sql), so the data-dependent stop
    # iteration is value-checked too
    e = _edges(spark, sf_dir)
    res = pagerank(_vertices(e), e, max_iterations=100, tol=1e-6)
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def _q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    return connected_components(_vertices(e), e).components


def _q_wcc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental WCC: components of a deterministic 80% edge subset,
    then merge the held-out 20% as the "newly crawled" delta via
    component contraction. Must equal full WCC on all edges — the
    oracle is _WCC_SQL verbatim."""
    from neo4j_graph_algorithms_spark.operators.wcc import (
        connected_components_incremental,
    )

    e = _edges(spark, sf_dir)
    e0 = e.filter((F.col("src") + F.col("dst")) % 5 != 0)
    enew = e.filter((F.col("src") + F.col("dst")) % 5 == 0)
    prev = connected_components(_vertices(e), e0).components
    return connected_components_incremental(prev, enew).components


def _q_streaming_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained WCC: the edge table arrives as FOUR
    crawl-drop micro-batches through Structured Streaming (foreachBatch
    folding streaming/graph_maintenance.run_component_maintenance:
    full WCC on drop 0, delta-sized component contraction per later
    drop, durable per-batch state + lineage metrics). The final
    maintained state must equal batch WCC over all edges — the oracle
    is _WCC_SQL verbatim (min-label canonicalization is
    arrival-order-independent)."""
    import tempfile

    from neo4j_graph_algorithms_spark.streaming.graph_maintenance import (
        run_component_maintenance,
    )

    root = tempfile.mkdtemp(prefix="nga_stream_wcc_")
    deltas = os.path.join(root, "deltas")
    os.makedirs(deltas)
    e = _edges(spark, sf_dir)
    for i in range(4):
        stage = os.path.join(root, f"stage{i}")
        (e.filter(F.pmod(F.col("src") + F.col("dst"), F.lit(4)) == i)
         .coalesce(1).write.mode("overwrite").parquet(stage))
        part = next(f for f in sorted(os.listdir(stage))
                    if f.endswith(".parquet"))
        os.rename(os.path.join(stage, part),
                  os.path.join(deltas, f"drop{i}.parquet"))
    return run_component_maintenance(
        spark, deltas, os.path.join(root, "state"),
        max_files_per_trigger=1)


def _q_streaming_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained MinHash-LSH near-dup candidates: the
    documents table arrives as FOUR crawl-drop micro-batches
    (streaming/dedup.py:run_near_dup_maintenance — durable posting
    store + pair state per batch). The maintained pair set must equal
    batch minhash_lsh_candidates over the whole corpus at the same
    (4 hashes, 2 bands) config — the oracle is that query's SQL
    verbatim (candidacy is drop-order-independent)."""
    import tempfile

    from neo4j_graph_algorithms_spark.streaming.dedup import (
        run_near_dup_maintenance,
    )

    root = tempfile.mkdtemp(prefix="nga_stream_neardup_")
    drops = os.path.join(root, "drops")
    os.makedirs(drops)
    d = _t(spark, sf_dir, "documents")
    for i in range(4):
        stage = os.path.join(root, f"stage{i}")
        (d.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
         .coalesce(1).write.mode("overwrite").parquet(stage))
        part = next(f for f in sorted(os.listdir(stage))
                    if f.endswith(".parquet"))
        os.rename(os.path.join(stage, part),
                  os.path.join(drops, f"drop{i}.parquet"))
    return run_near_dup_maintenance(
        spark, drops, os.path.join(root, "state"),
        n_hashes=4, bands=2, max_files_per_trigger=1)


def _q_wcc_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges_weighted(spark, sf_dir)
    return connected_components(_vertices(e), e, threshold=2.0).components


def _q_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    v = _vertices(e)
    res = label_propagation(
        v, e, max_iterations=LPA_ITERS, min_iterations=LPA_ITERS,
        direction="out", partition_col=None, node_weight_col=None,
    )
    return res.labels


def _q_lpa_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded + weighted LPA — the reference's 'partition' seed and
    'weight' node-property path (LabelPropagation.java:45-51,221-228)
    over the multiplicity-weighted edges: seed = id % 7 on every third
    node, voter weight = 1 + id % 4; votes = edge weight × voter
    weight (operators/labelprop.py)."""
    e = _edges_weighted(spark, sf_dir)
    v = _vertices(e.select(F.col("src"), F.col("dst"))).select(
        "id",
        F.when(F.col("id") % 3 == 0, F.col("id") % 7).alias("partition"),
        (1 + F.col("id") % 4).cast("double").alias("weight"),
    )
    res = label_propagation(
        v, e, max_iterations=LPA_ITERS, min_iterations=LPA_ITERS,
        direction="out", partition_col="partition",
        node_weight_col="weight",
    )
    return res.labels


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    return triangle_count(_vertices(e), e).node_counts.select("id", "triangles")


def _q_triangles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DOULION (KDD'09) edge-sparsified triangle estimate at p=0.5: the
    # coin flip is a deterministic md5 hash of (lo, hi, seed), so the
    # oracle replays the IDENTICAL sample and the check is bit-exact
    from neo4j_graph_algorithms_spark.operators.triangles import (
        triangle_count_sampled,
    )

    e = _edges(spark, sf_dir)
    res = triangle_count_sampled(_vertices(e), e, p=0.5, seed=0)
    return res.node_counts.select(
        "id", F.round("triangles_est", 6).alias("triangles_est"),
        F.round("coefficient", 6).alias("coefficient"))


def _q_triangles_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental triangle maintenance: counts on a deterministic 80%
    edge subset, then merge the held-out 20% as the crawl delta (each
    delta triangle weighted 1/#new-edges so its k discoveries sum to
    one). Oracle = full per-node triangle count on all edges."""
    from neo4j_graph_algorithms_spark.operators.triangles import (
        triangle_count_incremental,
    )

    e = _edges(spark, sf_dir)
    v = _vertices(e)
    e0 = e.filter((F.col("src") + F.col("dst")) % 5 != 0)
    enew = e.filter((F.col("src") + F.col("dst")) % 5 == 0)
    prev = triangle_count(v, e0)
    res = triangle_count_incremental(v, e0, enew, prev.node_counts)
    return res.node_counts.select("id", "triangles")


def _q_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    return triangle_count(_vertices(e), e).node_counts.select(
        "id", F.round("coefficient", 6).alias("coefficient")
    )


def _q_triangle_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    res = triangle_count(_vertices(e), e)
    return spark.createDataFrame(
        [(res.triangle_count, round(res.average_coefficient, 6))],
        "triangles long, avg_coefficient double",
    )


def _q_wcc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community-size stats YIELD row over the WCC result — the
    reference's write-mode setCount/p* surface
    (UnionFindProcExec.java:177-198). Exact percentiles, oracle =
    _WCC_STATS_SQL (quantile_cont ≡ SQL percentile interpolation)."""
    from neo4j_graph_algorithms_spark.operators.wcc import community_stats

    e = _edges(spark, sf_dir)
    comps = connected_components(_vertices(e), e).components
    stats = community_stats(comps)
    return stats.select(
        "n_nodes", "n_communities", "min_size",
        *[F.round(c, 6).alias(c) for c in
          ("p25", "p50", "p75", "p90", "p95", "p99")],
        "max_size",
    )


def _q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone modularity YIELD row (the metric Louvain optimizes,
    exposed as its own query): Q of the deterministic partition
    ``community = id % 4`` over the symmetrized weighted view — an
    arbitrary fixed partition exercises BOTH the in_c and tot_c terms
    (components would make every edge intra-community). Oracle replays
    the identical symmetrization + Q formula in SQL."""
    from neo4j_graph_algorithms_spark.operators.louvain import (
        _sym_weighted, modularity,
    )

    e = _edges(spark, sf_dir)
    sym = _sym_weighted(e)
    labels = _vertices(e).select(
        "id", (F.col("id") % 4).alias("community"))
    q = modularity(sym, labels)
    return spark.createDataFrame([(round(q, 6) + 0.0,)],
                                 "modularity double")


def _q_degree(direction: str, weighted: bool):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        e = _edges_weighted(spark, sf_dir) if weighted else _edges(spark, sf_dir)
        return degree_centrality(
            _vertices(e), e, direction=direction, weighted=weighted
        ).select("id", F.round("score", 6).alias("score"))
    return q


def _q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.operators.traversal import bfs_distances

    e = _edges(spark, sf_dir)
    return bfs_distances(_vertices(e), e, 0).select(
        "id", F.col("distance").cast("long").alias("distance")
    )


def _q_allsp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted all-pairs shortest paths stream on the induced id<60
    subgraph (multi-source Bellman-Ford; oracle = unrolled per-source
    relaxation CTEs)."""
    from neo4j_graph_algorithms_spark.operators.traversal import (
        all_shortest_paths,
    )

    e = _edges_weighted(spark, sf_dir).filter(
        (F.col("src") < 60) & (F.col("dst") < 60))
    v = _vertices(e)
    return all_shortest_paths(v, e).select(
        "source", "id", F.round("cost", 6).alias("cost")
    )


def _astar_coords():
    """Deterministic synthetic coordinates from the node id (integer
    arithmetic, identical in Spark and DuckDB)."""
    lat = ((F.col("id") * 13) % 89 - 44).cast("double")
    lon = ((F.col("id") * 29) % 179 - 89).cast("double")
    return lat, lon


_HAV_SQL = (
    "6371.0 * 2 * atan2(sqrt("
    "sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2)"
    "), sqrt(1 - ("
    "sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2)"
    "))) * 0.539957"
)


def _q_astar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """algo.shortestPath.astar 0→7 on the induced id<60 subgraph with
    synthetic coords and weights = exact haversine NM (the admissible
    regime); oracle = unrolled Bellman-Ford + recursive pred walk."""
    from neo4j_graph_algorithms_spark.operators.traversal import (
        shortest_path_astar,
    )

    e0 = _sub_edges(spark, sf_dir, 60)
    lat, lon = _astar_coords()
    v = _vertices(e0).select("id", lat.alias("lat"), lon.alias("lon"))
    cs = v.select(F.col("id").alias("src"), F.col("lat").alias("_la1"),
                  F.col("lon").alias("_lo1"))
    cd = v.select(F.col("id").alias("dst"), F.col("lat").alias("_la2"),
                  F.col("lon").alias("_lo2"))
    from neo4j_graph_algorithms_spark.operators.traversal import _haversine_nm

    e = (
        e0.join(cs, "src").join(cd, "dst")
        .select("src", "dst",
                _haversine_nm(F.col("_la1"), F.col("_lo1"),
                              F.col("_la2"), F.col("_lo2")).alias("weight"))
    )
    return shortest_path_astar(v, e, 0, 7).select(
        "step", "id", F.round("cost", 4).alias("cost")
    )


def _astar_oracle_sql(iters: int = 15, n_sub: int = 60,
                      source: int = 0, target: int = 7) -> str:
    hav = _HAV_SQL.format(lat1="c1.lat", lon1="c1.lon",
                          lat2="c2.lat", lon2="c2.lon")
    parts = [
        _sub_cte(n_sub),
        _SNODES_CTE,
        "coords AS MATERIALIZED (SELECT id, "
        "CAST((id * 13) % 89 - 44 AS DOUBLE) AS lat, "
        "CAST((id * 29) % 179 - 89 AS DOUBLE) AS lon FROM snodes)",
        f"we AS MATERIALIZED (SELECT e.src, e.dst, {hav} AS w FROM sub e "
        f"JOIN coords c1 ON c1.id = e.src JOIN coords c2 ON c2.id = e.dst)",
        f"d0 AS MATERIALIZED (SELECT id, CASE WHEN id = {source} THEN 0.0 END "
        f"AS cost FROM snodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS id, "
            f"min(d.cost + e.w) AS c FROM we e JOIN d{i-1} d ON d.id = e.src "
            f"WHERE d.cost IS NOT NULL GROUP BY e.dst)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT p.id, "
            f"CASE WHEN p.cost IS NULL THEN c.c "
            f"     WHEN c.c IS NULL THEN p.cost "
            f"     WHEN c.c < p.cost THEN c.c ELSE p.cost END AS cost "
            f"FROM d{i-1} p LEFT JOIN c{i} c ON p.id = c.id)"
        )
    parts.append(
        f"dist AS MATERIALIZED (SELECT id, cost FROM d{iters} "
        f"WHERE cost IS NOT NULL)")
    parts.append(
        f"pred AS MATERIALIZED (SELECT e.dst AS id, min(e.src) AS pred "
        f"FROM we e JOIN dist a ON a.id = e.src JOIN dist b ON b.id = e.dst "
        f"WHERE abs(a.cost + e.w - b.cost) < 1e-9 AND e.dst <> {source} "
        f"GROUP BY e.dst)")
    parts.append(
        f"walk(id, back) AS (SELECT CAST({target} AS BIGINT), 0 "
        f"UNION ALL SELECT p.pred, w.back + 1 FROM walk w "
        f"JOIN pred p ON p.id = w.id WHERE w.back < 200)")
    return (
        "WITH RECURSIVE " + ",\n".join(parts)
        + "\nSELECT CAST((SELECT max(back) FROM walk) - back AS INT) AS step,"
        " id, round(d.cost, 4) AS cost"
        " FROM walk JOIN dist d USING (id)"
    )


def _q_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-pair weighted shortest path 0→173 with path reconstruction
    # (pointer-doubling ancestor closure, operators/traversal.py)
    from neo4j_graph_algorithms_spark.operators.traversal import (
        shortest_path,
    )

    e = _edges_weighted(spark, sf_dir)
    return shortest_path(_vertices(e), e, 0, 173).select(
        "step", "id", F.round("cost", 6).alias("cost")
    )


def _shortest_path_oracle_sql(iters: int = 20, source: int = 0,
                              target: int = 173) -> str:
    """Bellman-Ford fixpoint (the _sssp_unrolled_sql chain) + the same
    deterministic predecessor rule as _recover_path (pred(v) = min src
    with cost(src) + w == cost(v), 1e-9 tolerance) + a recursive
    backwalk from the target; step numbers count forward from the
    source exactly like the Spark operator's output."""
    parts = [
        _WEDGES_CTE,
        "nodes AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM wedges UNION ALL SELECT dst FROM wedges))",
        f"d0 AS MATERIALIZED (SELECT id, CASE WHEN id = {source} THEN 0.0 END "
        "AS cost FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS id, "
            f"min(d.cost + e.weight) AS c "
            f"FROM wedges e JOIN d{i-1} d ON d.id = e.src "
            f"WHERE d.cost IS NOT NULL GROUP BY e.dst)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT p.id, "
            f"CASE WHEN p.cost IS NULL THEN c.c "
            f"     WHEN c.c IS NULL THEN p.cost "
            f"     WHEN c.c < p.cost THEN c.c ELSE p.cost END AS cost "
            f"FROM d{i-1} p LEFT JOIN c{i} c ON p.id = c.id)"
        )
    parts.append(
        f"dist AS MATERIALIZED (SELECT id, cost FROM d{iters} "
        f"WHERE cost IS NOT NULL)")
    parts.append(
        f"pred AS MATERIALIZED (SELECT e.dst AS id, min(e.src) AS pred "
        f"FROM wedges e JOIN dist a ON a.id = e.src "
        f"JOIN dist b ON b.id = e.dst "
        f"WHERE abs(a.cost + e.weight - b.cost) < 1e-9 "
        f"AND e.dst <> {source} GROUP BY e.dst)")
    parts.append(
        f"walk(id, back) AS (SELECT CAST({target} AS BIGINT), 0 "
        f"UNION ALL SELECT p.pred, w.back + 1 FROM walk w "
        f"JOIN pred p ON p.id = w.id WHERE w.back < 200)")
    return (
        "WITH RECURSIVE " + ",\n".join(parts)
        + "\nSELECT CAST((SELECT max(back) FROM walk) - back AS INT) AS step,"
        " id, round(d.cost, 6) AS cost"
        " FROM walk JOIN dist d USING (id)"
    )


def _q_infomap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PageRank-seeded greedy map-equation merging (InfoMap.java) on the
    # induced id<200 subgraph — iterative, engine-native → rows-only
    from neo4j_graph_algorithms_spark.operators.infomap import infomap

    e = _sub_edges(spark, sf_dir)
    v = _vertices(e)
    return infomap(v, e).communities


def _q_infomap_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic driver evidence for the full data-dependent InfoMap
    path (VERDICT r3 next-round #6): labels aren't SQL-expressible,
    but the invariants are — the output is a valid partition (exactly
    one community row per vertex), and because every iteration commits
    exactly one pairwise merge starting from singletons,
    community_count + iterations == |V| must hold exactly. The oracle
    knows |V| independently; a run that drops/duplicates a vertex or
    breaks merge accounting goes red."""
    from neo4j_graph_algorithms_spark.operators.infomap import infomap

    e = _sub_edges(spark, sf_dir)
    v = _vertices(e)
    res = infomap(v, e)
    rows = res.communities.count()
    distinct_ids = res.communities.select("id").distinct().count()
    return spark.createDataFrame(
        [(int(rows), int(distinct_ids),
          int(res.community_count + res.iterations))],
        "n_rows long, n_distinct_ids long, comms_plus_merges long")


def _infomap_invariants_oracle_sql() -> str:
    return f"""
        WITH {_sub_cte(SUB_N)}, {_SNODES_CTE},
        nv AS (SELECT count(*) AS n FROM snodes)
        SELECT n AS n_rows, n AS n_distinct_ids, n AS comms_plus_merges
        FROM nv
    """


def _q_infomap_fixedmerges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-merge-count InfoMap on the induced id<200
    subgraph — up to 8 map-equation argmin merges with 9-dp-rounded ΔL
    and (ΔL, c_j, c_k) tie-break, fully replayed by the unrolled SQL
    oracle (_infomap_fixedmerges_sql): distributed PageRank seed at
    damping 1−τ, pure-function module stats per step, argmin pick,
    higher community id merged into lower."""
    from neo4j_graph_algorithms_spark.operators.infomap import (
        infomap_fixed_merges,
    )

    e = _sub_edges(spark, sf_dir)
    v = _vertices(e)
    return infomap_fixed_merges(v, e, n_merges=8).communities


def _infomap_fixedmerges_sql(
    n_merges: int = 8,
    pr_iters: int = 10,
    tau: float = 0.15,
    threshold: float = 0.005,
) -> str:
    """Unrolled fixed-merge InfoMap: symmetrized normalized subgraph →
    unrolled PageRank seed (damping 1−τ, base τ) → per merge step,
    module stats (p_i, n_i, exit flow w_i, q_i, Σq) as aggregations of
    the current labels, map-equation ΔL per adjacent module pair,
    argmin pick (ΔL rounded 9 dp, ties by cj, ck), labels relabeled
    ck→cj. A step with no candidate below −threshold leaves labels
    unchanged (≡ the operator's break)."""
    t1 = 1.0 - tau

    def plogp(x: str) -> str:
        return (f"(CASE WHEN ({x}) > 0 THEN ({x}) * log2({x}) "
                f"ELSE 0.0 END)")

    parts = [
        _EDGES_CTE,
        f"sub AS MATERIALIZED (SELECT src, dst FROM edges "
        f"WHERE src < {SUB_N} AND dst < {SUB_N})",
        "verts AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM sub UNION ALL SELECT dst FROM sub))",
        "se AS MATERIALIZED (SELECT src, dst FROM sub WHERE src <> dst)",
        "sym AS MATERIALIZED (SELECT src, dst, CAST(sum(w) AS DOUBLE) AS w "
        "FROM (SELECT src, dst, 1.0 AS w FROM se "
        "UNION ALL SELECT dst AS src, src AS dst, 1.0 AS w FROM se) "
        "GROUP BY src, dst)",
        "ideg AS (SELECT src, count(*) AS outd FROM sym GROUP BY src)",
        "ifac AS MATERIALIZED (SELECT s.src, s.dst, 1.0 / d.outd AS factor "
        "FROM sym s JOIN ideg d ON s.src = d.src)",
        f"ip0 AS MATERIALIZED (SELECT id, CAST({tau} AS DOUBLE) AS rank "
        f"FROM verts)",
    ]
    for i in range(1, pr_iters + 1):
        parts.append(
            f"im{i} AS (SELECT f.dst AS id, sum(r.rank * f.factor) AS msg "
            f"FROM ifac f JOIN ip{i-1} r ON f.src = r.id GROUP BY f.dst)"
        )
        parts.append(
            f"ip{i} AS MATERIALIZED (SELECT n.id, "
            f"{tau} + {t1} * coalesce(m.msg, 0.0) AS rank "
            f"FROM verts n LEFT JOIN im{i} m ON n.id = m.id)"
        )
    parts += [
        f"pp AS MATERIALIZED (SELECT id, rank AS p FROM ip{pr_iters})",
        "itot AS (SELECT src, sum(w) AS tot FROM sym GROUP BY src)",
        "nv AS MATERIALIZED (SELECT s.src, s.dst, s.w / t.tot AS v "
        "FROM sym s JOIN itot t ON s.src = t.src)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n "
        "FROM verts)",
        "lab0 AS MATERIALIZED (SELECT id, id AS community FROM verts)",
    ]
    for r in range(n_merges):
        qi = (f"{tau} * (j.p_i + k.p_i) * (nn.n - (j.n_i + k.n_i)) / "
              f"(nn.n - 1.0) + {t1} * (j.w_i + k.w_i - f.wjk)")
        dl = (f"{plogp(f'({qi}) - j.q_i - k.q_i + sq{r}.s_q')} "
              f"- {plogp(f'sq{r}.s_q')} "
              f"- 2 * {plogp(qi)} + 2 * {plogp('j.q_i')} "
              f"+ 2 * {plogp('k.q_i')} "
              f"+ {plogp(f'j.p_i + k.p_i + ({qi})')} "
              f"- {plogp('j.p_i + j.q_i')} - {plogp('k.p_i + k.q_i')}")
        parts += [
            f"pm{r} AS MATERIALIZED (SELECT l.community AS c, "
            f"count(*) AS n_i, sum(p.p) AS p_i "
            f"FROM lab{r} l JOIN pp p ON p.id = l.id GROUP BY 1)",
            f"wm{r} AS MATERIALIZED (SELECT ls.community AS c, "
            f"sum(nv.v * p.p) AS w_i "
            f"FROM nv JOIN lab{r} ls ON ls.id = nv.src "
            f"JOIN lab{r} ld ON ld.id = nv.dst "
            f"JOIN pp p ON p.id = nv.src "
            f"WHERE ls.community <> ld.community GROUP BY 1)",
            f"qm{r} AS MATERIALIZED (SELECT m.c, m.n_i, m.p_i, "
            f"coalesce(w.w_i, 0.0) AS w_i, "
            f"{tau} * m.p_i * (nn.n - m.n_i) / (nn.n - 1.0) "
            f"+ {t1} * coalesce(w.w_i, 0.0) AS q_i "
            f"FROM pm{r} m LEFT JOIN wm{r} w ON w.c = m.c CROSS JOIN nn)",
            f"sq{r} AS MATERIALIZED (SELECT sum(q_i) AS s_q FROM qm{r})",
            f"fl{r} AS MATERIALIZED (SELECT "
            f"least(ls.community, ld.community) AS cj, "
            f"greatest(ls.community, ld.community) AS ck, "
            f"sum(nv.v * p.p) AS wjk "
            f"FROM nv JOIN lab{r} ls ON ls.id = nv.src "
            f"JOIN lab{r} ld ON ld.id = nv.dst "
            f"JOIN pp p ON p.id = nv.src "
            f"WHERE ls.community <> ld.community GROUP BY 1, 2)",
            f"cand{r} AS MATERIALIZED (SELECT f.cj, f.ck, "
            f"round({dl}, 9) AS dlr "
            f"FROM fl{r} f JOIN qm{r} j ON j.c = f.cj "
            f"JOIN qm{r} k ON k.c = f.ck CROSS JOIN sq{r} CROSS JOIN nn)",
            f"pick{r} AS MATERIALIZED (SELECT cj, ck FROM cand{r} "
            f"WHERE dlr < -{threshold} ORDER BY dlr, cj, ck LIMIT 1)",
            f"lab{r + 1} AS MATERIALIZED (SELECT l.id, "
            f"CASE WHEN l.community = (SELECT ck FROM pick{r}) "
            f"THEN (SELECT cj FROM pick{r}) ELSE l.community END "
            f"AS community FROM lab{r} l)",
        ]
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT id, community FROM lab{n_merges}")


def _q_kshortest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Yen's k shortest loopless paths 0→7 on the induced id<60 subgraph
    # (spur searches are distributed shortest_path runs). Output is the
    # per-path summary (index, hops, cost): with unit weights the top-k
    # cost multiset is tie-break independent, so it oracle-checks against
    # exhaustive simple-path enumeration (_ksp_oracle_sql); per-step node
    # ids are tie-dependent and stay covered by tests/test_yens.py.
    from neo4j_graph_algorithms_spark.operators.yens import k_shortest_paths

    e = _sub_edges(spark, sf_dir, 60)
    v = _vertices(e)
    return (
        k_shortest_paths(v, e, 0, 7, 3).paths
        .groupBy("path_index")
        .agg(F.max("step").cast("int").alias("n_hops"),
             F.round(F.first("path_cost"), 6).alias("path_cost"))
    )


def _ksp_oracle_sql(n: int = 60, source: int = 0, target: int = 7,
                    k: int = 3, cap: int = 10) -> str:
    """Exhaustive loopless-path enumeration on the induced id<n subgraph:
    the k smallest simple-path costs are unique regardless of Yen's
    tie-breaking. cap=10 verified cap-insensitive for the top-3 at
    sf0.001 and sf0.01."""
    return f"""
        WITH RECURSIVE {_EDGES_CTE},
        sub AS (SELECT src, dst FROM edges WHERE src < {n} AND dst < {n}),
        p(id, hops, visited) AS (
          SELECT CAST({source} AS BIGINT), 0, [CAST({source} AS BIGINT)]
          UNION ALL
          SELECT e.dst, p.hops + 1, list_append(p.visited, e.dst)
          FROM p JOIN sub e ON e.src = p.id
          WHERE p.id <> {target} AND p.hops < {cap}
            AND NOT list_contains(p.visited, e.dst)
        )
        SELECT CAST(row_number() OVER (ORDER BY hops) - 1 AS INT)
                 AS path_index,
               CAST(hops AS INT) AS n_hops,
               round(CAST(hops AS DOUBLE), 6) AS path_cost
        FROM p WHERE id = {target} ORDER BY hops LIMIT {k}
    """


def _q_as_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """algo.similarity.asVector: (item, weight) rows → per-node ordered
    vector<struct>, flattened back via posexplode so every element is
    value-checked against the SQL oracle."""
    from neo4j_graph_algorithms_spark.operators.similarity import as_vector

    e = _edges_weighted(spark, sf_dir).filter(F.col("src") < 100)
    vec = as_vector(
        e.select(F.col("src").alias("id"), F.col("dst").alias("item"),
                 "weight"),
        "id",
    )
    return vec.select("id", F.posexplode("vector")).select(
        "id", "pos", F.col("col.item").alias("item"),
        F.round("col.weight", 6).alias("weight"),
    )


def _q_dfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DFS preorder (algo.dfs.stream) from node 0 on the induced id<200
    # subgraph — deterministic (ascending-adjacency addFirst stack walk);
    # oracle = single-row stack-machine recursive CTE replaying the walk
    from neo4j_graph_algorithms_spark.operators.traversal import dfs_order

    e = _sub_edges(spark, sf_dir)
    v = _vertices(e)
    return dfs_order(v, e, 0)


def _q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weighted shortest paths (multiplicity-derived weights); oracle =
    # unrolled Bellman-Ford chained CTEs (_sssp_unrolled_sql)
    from neo4j_graph_algorithms_spark.operators.traversal import sssp

    e = _edges_weighted(spark, sf_dir)
    return sssp(_vertices(e), e, 0).select(
        "id", F.round("cost", 6).alias("cost")
    )


def _q_articlerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.operators.centrality_variants import (
        articlerank,
    )

    e = _edges(spark, sf_dir)
    res = articlerank(_vertices(e), e, max_iterations=PR_ITERS, tol=0.0)
    return res.scores.select("id", F.round("score", 6).alias("score"))


def _q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed-iteration power iteration is deterministic — oracle =
    # unrolled msg/L2-normalize CTE pairs (_eigenvector_unrolled_sql)
    from neo4j_graph_algorithms_spark.operators.centrality_variants import (
        eigenvector_centrality,
    )

    e = _edges(spark, sf_dir)
    res = eigenvector_centrality(_vertices(e), e, max_iterations=PR_ITERS,
                                 normalization="max")
    return res.scores.select("id", F.round("score", 6).alias("score"))


def _q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HITS hubs & authorities (engine extension — no reference proc);
    # fixed-iteration alternating power iteration is deterministic —
    # oracle = unrolled auth/hub half-step CTE pairs (_hits_unrolled_sql)
    from neo4j_graph_algorithms_spark.operators.centrality_variants import hits

    e = _edges(spark, sf_dir)
    res = hits(_vertices(e), e, max_iterations=PR_ITERS)
    return res.scores.select(
        "id", F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"))


def _q_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SALSA hubs & authorities (engine extension): degree-normalized
    # bipartite-walk sibling of HITS; deterministic at fixed iterations
    # — oracle = unrolled normalized half-step CTEs (_salsa_unrolled_sql)
    from neo4j_graph_algorithms_spark.operators.centrality_variants import (
        salsa,
    )

    e = _edges(spark, sf_dir)
    res = salsa(_vertices(e), e, max_iterations=PR_ITERS)
    return res.scores.select(
        "id", F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"))


def _q_eigenvector_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exercises the Normalization.java l1norm post-step
    from neo4j_graph_algorithms_spark.operators.centrality_variants import (
        eigenvector_centrality,
    )

    e = _edges(spark, sf_dir)
    res = eigenvector_centrality(_vertices(e), e, max_iterations=PR_ITERS,
                                 normalization="l1norm")
    return res.scores.select("id", F.round("score", 6).alias("score"))




# ---- Spark F.hash (Murmur3_x86_32) replicated as DuckDB CTE stages ----
# random_walks picks out-edge rank hash(walk_id, step, seed) % outdeg
# (operators/traversal.py:512); the oracle replays the identical hash
# bit-for-bit (validated 200/200 vs F.hash) and simulates the walk.
_MM32 = 1 << 32
_MC1 = 0xCC9E2D51
_MC2 = 0x1B873593


def _mul(x, c):
    return f"CAST((CAST({x} AS HUGEINT) * {c}) % {_MM32} AS BIGINT)"


def _rotl(x, r):
    return f"(((({x}) << {r}) | (({x}) >> {32 - r})) % {_MM32})"


def _xor(a, b):
    return f"xor(CAST({a} AS BIGINT), CAST({b} AS BIGINT))"


class _HashChain:
    def __init__(self, name, keep):
        self.name, self.keep, self.ctes, self.i = name, keep, [], 0

    def stage(self, expr_h, extra=""):
        prev = f"{self.name}{self.i}"
        self.i += 1
        cols = f"{self.keep}, {expr_h} AS h"
        if extra:
            cols += f", {extra}"
        self.ctes.append(
            f"{self.name}{self.i} AS MATERIALIZED (SELECT {cols} FROM {prev})")

    def mixk1_into(self, src):
        self.stage("h", extra=f"{_mul(src, _MC1)} AS k")
        self.stage("h", extra=f"{_rotl('k', 15)} AS k")
        self.stage("h", extra=f"{_mul('k', _MC2)} AS k")

    def mixh1(self):
        self.stage(f"({_xor('h', 'k')}) % {_MM32}", extra="k")
        self.stage(f"{_rotl('h', 13)}", extra="k")
        self.stage(f"((h * 5) + {0xE6546B64}) % {_MM32}", extra="k")

    def fmix(self, length):
        self.stage(f"({_xor('h', length)}) % {_MM32}")
        self.stage(f"({_xor('h', '(h >> 16)')}) % {_MM32}")
        self.stage(f"{_mul('h', 0x85EBCA6B)}")
        self.stage(f"({_xor('h', '(h >> 13)')}) % {_MM32}")
        self.stage(f"{_mul('h', 0xC2B2AE35)}")
        self.stage(f"({_xor('h', '(h >> 16)')}) % {_MM32}")


def murmur3_long_int_int_ctes(name, src_cte, long_col, keep, i1, i2, seed=42):
    """CTE chain for Spark F.hash(long_col, lit(i1), lit(i2)); final CTE
    {name}F has columns keep + h (signed 32-bit as BIGINT)."""
    ch = _HashChain(name, keep)
    ch.ctes.append(
        f"{name}0 AS (SELECT {keep}, {seed} AS h, "
        f"CAST((CAST({long_col} AS HUGEINT) % {1 << 64} + {1 << 64}) "
        f"% {1 << 64} % {_MM32} AS BIGINT) AS lo, "
        f"CAST(((CAST({long_col} AS HUGEINT) % {1 << 64} + {1 << 64}) "
        f"% {1 << 64}) // {_MM32} AS BIGINT) AS hi FROM {src_cte})")
    ch.keep = keep + ", lo, hi"
    ch.mixk1_into("lo")
    ch.mixh1()
    ch.mixk1_into("hi")
    ch.mixh1()
    ch.fmix(8)
    for iv in (i1, i2):
        ch.mixk1_into(f"(({iv} % {_MM32}) + {_MM32}) % {_MM32}")
        ch.mixh1()
        ch.fmix(4)
    ch.ctes.append(
        f"{name}F AS MATERIALIZED (SELECT {keep}, CAST(CASE WHEN h >= {1 << 31} "
        f"THEN h - {_MM32} ELSE h END AS BIGINT) AS h FROM {name}{ch.i})")
    return ch.ctes


def _random_walks_oracle_sql(n_starts=50, walk_length=3, seed=42):
    parts = [
        _EDGES_CTE,
        "rdeg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        "ranked AS MATERIALIZED (SELECT src, dst, "
        "row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk FROM edges)",
        "nodes AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges))",
        f"w0 AS MATERIALIZED (SELECT CAST(id AS BIGINT) AS walk_id, "
        f"CAST(id AS BIGINT) AS node FROM nodes WHERE id < {n_starts})",
    ]
    for s in range(1, walk_length + 1):
        parts += murmur3_long_int_int_ctes(
            f"s{s}_", "w0", "walk_id", "walk_id", s, seed)
        parts.append(
            f"w{s} AS MATERIALIZED (SELECT w.walk_id, CAST(r.dst AS BIGINT) AS node "
            f"FROM w{s-1} w "
            f"JOIN s{s}_F h ON h.walk_id = w.walk_id "
            f"JOIN rdeg d ON d.src = w.node "
            f"JOIN ranked r ON r.src = w.node "
            f"AND r.rk = ((h.h % d.deg) + d.deg) % d.deg)")
    sel = " UNION ALL ".join(
        f"SELECT walk_id, CAST({s} AS INT) AS step, node FROM w{s}"
        for s in range(walk_length + 1))
    return "WITH " + ",\n".join(parts) + "\n" + sel


def _hyperball_oracle_sql(radius: int = 3, b: int = 4,
                          final_select: str | None = None) -> str:
    """Bit-exact DuckDB replay of operators/hyperball.py: the Murmur3
    register init (same hash chain as the random-walk oracle), ``radius``
    elementwise-max gather rounds, and the shared HLL estimate expression
    (``hll_estimate_sql`` emits ONE text valid in both engines, so the
    double arithmetic runs in the same order — register sums are dyadic
    rationals, exact in IEEE doubles). With ``final_select`` the
    per-radius estimates become a ``balls(id, r, ball_est)`` CTE that the
    caller's SELECT composes on (eccentricity)."""
    from neo4j_graph_algorithms_spark.operators.hyperball import (
        HASH_SALT1,
        HASH_SALT2,
        hll_estimate_sql,
    )

    m = 1 << b
    rho_cap = 32 - b + 1
    parts = [
        _EDGES_CTE,
        _NODES_CTE,
        "hedges AS (SELECT src, dst FROM edges WHERE src <> dst)",
    ]
    parts += murmur3_long_int_int_ctes(
        "hb_", "nodes", "id", "id", HASH_SALT1, HASH_SALT2)
    parts.append(
        "hu AS (SELECT id, CASE WHEN h < 0 THEN h + 4294967296 ELSE h END "
        "AS u FROM hb_F)")
    parts.append(
        f"hrho AS (SELECT id, CAST(u % {m} AS INT) AS j, "
        f"CASE WHEN u // {m} = 0 THEN {rho_cap} "
        f"ELSE CAST(log2((u // {m}) & (-(u // {m}))) AS INT) + 1 END AS rho "
        f"FROM hu)")
    parts.append(
        "regs0 AS MATERIALIZED (SELECT id, "
        + ", ".join(
            f"CASE WHEN j = {j} THEN rho ELSE 0 END AS r{j}" for j in range(m)
        )
        + " FROM hrho)")
    for t in range(1, radius + 1):
        parts.append(
            f"gath{t} AS (SELECT e.src AS id, "
            + ", ".join(f"max(g.r{j}) AS m{j}" for j in range(m))
            + f" FROM hedges e JOIN regs{t-1} g ON g.id = e.dst GROUP BY e.src)")
        parts.append(
            f"regs{t} AS MATERIALIZED (SELECT v.id, "
            + ", ".join(
                f"GREATEST(v.r{j}, COALESCE(g.m{j}, 0)) AS r{j}"
                for j in range(m)
            )
            + f" FROM regs{t-1} v LEFT JOIN gath{t} g ON g.id = v.id)")
    est = hll_estimate_sql(m)
    sel = " UNION ALL ".join(
        f"SELECT id, CAST({t} AS INT) AS r, {est} AS ball_est FROM regs{t}"
        for t in range(radius + 1))
    if final_select is None:
        return "WITH " + ",\n".join(parts) + "\n" + sel
    parts.append(f"balls AS ({sel})")
    return "WITH " + ",\n".join(parts) + "\n" + final_select


def _q_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall ball-size estimates (id, r, ball_micro) for r=0..3 at
    m=16 registers — the HLL-sketch scale path for the closeness family
    (exact MS-BFS is O(V*reach); see operators/hyperball.py docstring).
    The oracle replays registers and estimate bit-for-bit, then BOTH
    sides quantize to integer micro-units (round(est*1e6)) — raw double
    estimates proved 1-ulp fragile across engines/scales (VERDICT r3
    "what's wrong" #1), and the quantized compare is the same trick
    effective_diameter/hyperball_anf already use."""
    from neo4j_graph_algorithms_spark.operators.hyperball import hyperball

    e = _edges(spark, sf_dir)
    v = _vertices(e)
    res = hyperball(v, e, radius=3, b=4)
    return res.balls.select(
        "id", F.col("r").cast("int").alias("r"),
        F.round(F.col("ball_est") * 1e6).cast("long").alias("ball_micro"))


def _q_approx_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate eccentricity (operators/hyperball.py:
    approx_eccentricity): smallest radius whose ball estimate equals
    the final one, from the same bit-exact sketch as hyperball_balls.
    The oracle composes the plateau scan onto the HLL replay."""
    from neo4j_graph_algorithms_spark.operators.hyperball import (
        approx_eccentricity,
        hyperball,
    )

    e = _edges(spark, sf_dir)
    v = _vertices(e)
    res = hyperball(v, e, radius=3, b=4)
    return approx_eccentricity(res.balls)


_ECC_FINAL_SELECT = """
SELECT b.id, CAST(min(b.r) AS INT) AS ecc, round(max(f.fin), 6) AS reach
FROM balls b
JOIN (SELECT id, ball_est AS fin FROM balls
      WHERE r = (SELECT max(r) FROM balls)) f ON b.id = f.id
WHERE b.ball_est = f.fin
GROUP BY b.id
"""


def _q_hyperball_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF: neighborhood function anf(r) = Σ_v |ball(v, r)| from the
    same sketch as hyperball_balls. Per-vertex estimates are quantized to
    integer micro-units BEFORE the sum (each term is bit-exact vs the
    oracle, and an integer sum is addition-order-independent — a raw
    double Σ over 1000 vertices could differ in the last ulp between
    engines)."""
    from neo4j_graph_algorithms_spark.operators.hyperball import hyperball

    e = _edges(spark, sf_dir)
    v = _vertices(e)
    res = hyperball(v, e, radius=3, b=4)
    return (
        res.balls
        .select(F.col("r").cast("int").alias("r"),
                F.round(F.col("ball_est") * 1e6).cast("long").alias("_q"))
        .groupBy("r")
        .agg(F.sum("_q").alias("anf_micro"))
    )


def _hyperball_anf_oracle_sql(radius: int = 3, b: int = 4) -> str:
    # The outer CAST matters: DuckDB widens SUM(BIGINT) to HUGEINT,
    # which the driver's pandas `.df()` converts to float64 — hashing a
    # float against Spark's int64 (the r4 red row). BIGINT round-trips
    # to int64 exactly.
    return (
        "SELECT r, CAST(SUM(CAST(ROUND(ball_est * 1e6) AS BIGINT)) AS BIGINT)"
        " AS anf_micro "
        f"FROM ({_hyperball_oracle_sql(radius, b)}) GROUP BY r"
    )


def _q_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF §5 interpolated 90% effective diameter from the same
    bit-exact sketch as hyperball_balls. Ball estimates are quantized to
    integer micro-units BEFORE approx_effective_diameter's sums (exactly
    _q_hyperball_anf's trick) — the interpolation is a ratio, so the
    common 1e6 factor cancels and both engines divide identical
    integers."""
    from neo4j_graph_algorithms_spark.operators.hyperball import (
        approx_effective_diameter, hyperball,
    )

    e = _edges(spark, sf_dir)
    v = _vertices(e)
    balls = hyperball(v, e, radius=3, b=4).balls.select(
        "id", F.col("r").cast("int").alias("r"),
        F.round(F.col("ball_est") * 1e6).cast("long").alias("ball_est"))
    return approx_effective_diameter(balls, alpha=0.9).select(
        F.round("effective_diameter", 6).alias("effective_diameter"))


def _effective_diameter_oracle_sql(radius: int = 3, b: int = 4,
                                   alpha: float = 0.9) -> str:
    return f"""
        WITH anf AS (
            SELECT r, SUM(CAST(ROUND(ball_est * 1e6) AS BIGINT)) AS anf
            FROM ({_hyperball_oracle_sql(radius, b)}) GROUP BY r
        ),
        w AS (SELECT r, anf, lag(anf) OVER (ORDER BY r) AS prev,
                     max(anf) OVER () AS total
              FROM anf)
        SELECT round(CASE WHEN prev IS NULL OR anf <= prev
                          THEN CAST(r AS DOUBLE)
                          ELSE r - 1 + ({alpha!r} * total - prev)
                               / (anf - prev) END, 6)
               AS effective_diameter
        FROM w WHERE anf >= {alpha!r} * total ORDER BY r LIMIT 1
    """


def _q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic hash-sampled walks; oracle replays the identical
    # Murmur3 pick bit-for-bit (_random_walks_oracle_sql)
    from neo4j_graph_algorithms_spark.operators.traversal import random_walks

    e = _edges(spark, sf_dir)
    v = _vertices(e).filter(F.col("id") < 50)
    return random_walks(v, e, walks_per_node=1, walk_length=3)


def _q_random_walks_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted walks (extension — the reference's NodeWalker is
    uniform-only): pick = Murmur3 mod Σw interval-indexed into the
    dst-ordered cumulative weights; link-count weights are integral so
    the whole draw is integer arithmetic and the oracle replays it
    bit-for-bit."""
    from neo4j_graph_algorithms_spark.operators.traversal import (
        random_walks_weighted,
    )

    e = _edges_weighted(spark, sf_dir)
    v = _vertices(e).filter(F.col("id") < 50)
    return random_walks_weighted(v, e, walks_per_node=1, walk_length=3)


def _random_walks_weighted_oracle_sql(n_starts=50, walk_length=3, seed=42):
    parts = [
        _WEDGES_CTE,
        "we AS MATERIALIZED (SELECT src, dst, CAST(weight AS BIGINT) AS w "
        "FROM wedges WHERE weight > 0)",
        "wws AS MATERIALIZED (SELECT src, sum(w) AS ws FROM we GROUP BY src)",
        "wrank AS MATERIALIZED (SELECT src, dst, w, sum(w) OVER ("
        "PARTITION BY src ORDER BY dst ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW) AS cum FROM we)",
        "nodes AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM wedges UNION ALL SELECT dst FROM wedges))",
        f"w0 AS MATERIALIZED (SELECT CAST(id AS BIGINT) AS walk_id, "
        f"CAST(id AS BIGINT) AS node FROM nodes WHERE id < {n_starts})",
    ]
    for s in range(1, walk_length + 1):
        parts += murmur3_long_int_int_ctes(
            f"ws{s}_", "w0", "walk_id", "walk_id", s, seed)
        parts.append(
            f"w{s} AS MATERIALIZED (SELECT w.walk_id, "
            f"CAST(r.dst AS BIGINT) AS node "
            f"FROM w{s-1} w "
            f"JOIN ws{s}_F h ON h.walk_id = w.walk_id "
            f"JOIN wws d ON d.src = w.node "
            f"JOIN wrank r ON r.src = w.node "
            f"AND r.cum - r.w <= ((h.h % d.ws) + d.ws) % d.ws "
            f"AND ((h.h % d.ws) + d.ws) % d.ws < r.cum)")
    sel = " UNION ALL ".join(
        f"SELECT walk_id, CAST({s} AS INT) AS step, node FROM w{s}"
        for s in range(walk_length + 1))
    return "WITH " + ",\n".join(parts) + "\n" + sel


def _q_node2vec_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph → walks → skip-gram pair counts, end-to-end oracle-checked:
    the walks replay bit-for-bit (Murmur3 pick), the pair expansion is
    in-row (operators/traversal.py:walk_skipgram_pairs) while the oracle
    pairs by positional self-join — the embedding-training-data
    composition (DeepWalk corpus prep)."""
    from neo4j_graph_algorithms_spark.operators.traversal import (
        random_walks, walk_skipgram_pairs,
    )

    e = _edges(spark, sf_dir)
    v = _vertices(e).filter(F.col("id") < 50)
    walks = random_walks(v, e, walks_per_node=1, walk_length=3)
    return walk_skipgram_pairs(walks, window=2)


def _node2vec_pairs_oracle_sql(window: int = 2) -> str:
    """Walks oracle (bit-exact Murmur3 replay) nested as a CTE, pairs
    by positional self-join."""
    return f"""
        WITH w AS MATERIALIZED ({_random_walks_oracle_sql()}),
        pi AS (SELECT least(x.node, y.node) AS a,
                      greatest(x.node, y.node) AS b
               FROM w x JOIN w y ON x.walk_id = y.walk_id
               AND y.step > x.step AND y.step <= x.step + {window})
        SELECT a AS node_a, b AS node_b, count(*) AS n_pair
        FROM pi GROUP BY a, b
    """


def _q_linkprediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six algo.linkprediction.* scores per canonical edge
    (u < v, u < 100). sameCommunity uses a synthetic community property
    (id % 7) present only on id % 3 != 0 nodes, exercising the
    missing-property → 0.0 path (LinkPrediction.java:122-131)."""
    from neo4j_graph_algorithms_spark.operators.linkprediction import (
        link_prediction_for_pairs,
        same_community_for_pairs,
    )

    e = _edges(spark, sf_dir)
    canon = (
        e.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .dropDuplicates(["u", "v"])
        .filter(F.col("u") < 100)
    )
    comms = (
        _vertices(e).filter(F.col("id") % 3 != 0)
        .select("id", (F.col("id") % 7).alias("community"))
    )
    sc = same_community_for_pairs(canon, comms)
    return link_prediction_for_pairs(e, canon).join(sc, ["u", "v"]).select(
        "u", "v", "common_neighbors",
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("resource_allocation", 6).alias("resource_allocation"),
        "preferential_attachment", "total_neighbors", "same_community",
    )


# ---- closeness family / betweenness / SCC / spanning / louvain ------------
# (closeness-family + SCC run on the induced subgraph id < SUB_N so the
# DuckDB all-pairs recursive-CTE oracles stay small)

SUB_N = 200


def _sub_edges(spark: SparkSession, sf_dir: str, n: int = SUB_N) -> DataFrame:
    return _edges(spark, sf_dir).filter(
        (F.col("src") < n) & (F.col("dst") < n)
    )


def _q_closeness(wf: bool):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from neo4j_graph_algorithms_spark.operators.closeness import (
            closeness_centrality,
        )

        e = _sub_edges(spark, sf_dir)
        return closeness_centrality(_vertices(e), e, wasserman_faust=wf).select(
            "id", F.round("centrality", 6).alias("centrality")
        )
    return q


def _q_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.operators.closeness import (
        harmonic_centrality,
    )

    e = _sub_edges(spark, sf_dir)
    return harmonic_centrality(_vertices(e), e).select(
        "id", F.round("centrality", 6).alias("centrality")
    )


def _q_dangalchev(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.operators.closeness import (
        dangalchev_centrality,
    )

    e = _sub_edges(spark, sf_dir)
    return dangalchev_centrality(_vertices(e), e).select(
        "id", F.round("centrality", 6).alias("centrality")
    )


def _q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # oracle-checked: Brandes ≡ the pair-dependency triple sum
    # Σ_{s,t} σ_sv·σ_vt/σ_st, which IS SQL-expressible via layered
    # shortest-path counting (_betweenness_oracle_sql)
    from neo4j_graph_algorithms_spark.operators.betweenness import (
        betweenness_centrality,
    )

    e = _sub_edges(spark, sf_dir, 120)
    return betweenness_centrality(_vertices(e), e).select(
        "id", F.round("centrality", 4).alias("centrality")
    )


def _betweenness_oracle_sql(levels: int = 10, n_sub: int = 120) -> str:
    """Betweenness via the definition rather than Brandes' sweep:
    bc(v) = Σ_{s≠v≠t} σ_sv·σ_vt/σ_st over shortest-path counts σ.
    Unrolled BFS gives dist; σ builds layer by layer
    (σ(s,v at depth i) = Σ over in-edges from depth i-1); the triple
    join applies dist(s,v)+dist(v,t) = dist(s,t). Equals the Spark
    operator's parallel Brandes accumulation exactly (same OUTGOING
    direction, no sampling, divisor 1)."""
    parts = [
        _sub_cte(n_sub),
        _SNODES_CTE,
        "d0 AS MATERIALIZED (SELECT a.id AS s, b.id AS v, "
        "CASE WHEN a.id = b.id THEN 0 END AS d "
        "FROM snodes a CROSS JOIN snodes b)",
    ]
    for i in range(1, levels + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT d.s, e.dst AS v, min(d.d) + 1 AS c "
            f"FROM sub e JOIN d{i-1} d ON d.v = e.src "
            f"WHERE d.d IS NOT NULL GROUP BY d.s, e.dst)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT p.s, p.v, "
            f"CASE WHEN p.d IS NULL THEN c.c "
            f"     WHEN c.c IS NULL THEN p.d "
            f"     WHEN c.c < p.d THEN c.c ELSE p.d END AS d "
            f"FROM d{i-1} p LEFT JOIN c{i} c ON p.s = c.s AND p.v = c.v)"
        )
    parts.append(
        f"dd AS MATERIALIZED (SELECT s, v, d FROM d{levels} "
        f"WHERE d IS NOT NULL)")
    parts.append(
        "g0 AS MATERIALIZED (SELECT id AS s, id AS v, 0 AS d, "
        "CAST(1 AS DOUBLE) AS sig FROM snodes)")
    for i in range(1, levels + 1):
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT p.s, e.dst AS v, {i} AS d, "
            f"sum(p.sig) AS sig "
            f"FROM g{i-1} p JOIN sub e ON e.src = p.v "
            f"JOIN dd ON dd.s = p.s AND dd.v = e.dst AND dd.d = {i} "
            f"GROUP BY p.s, e.dst)"
        )
    all_g = " UNION ALL ".join(f"SELECT * FROM g{i}"
                               for i in range(levels + 1))
    parts.append(f"sg AS MATERIALIZED ({all_g})")
    parts.append(
        "bc AS MATERIALIZED (SELECT a.v AS id, "
        "sum(a.sig * b.sig / c.sig) AS centrality "
        "FROM sg a JOIN sg b ON b.s = a.v AND a.d > 0 AND b.d > 0 "
        "JOIN sg c ON c.s = a.s AND c.v = b.v AND c.d = a.d + b.d "
        "GROUP BY a.v)")
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT n.id, round(coalesce(bc.centrality, 0.0), 4) AS centrality"
        " FROM snodes n LEFT JOIN bc ON n.id = bc.id"
    )


def _q_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RA-Brandes with the reference's degree-proportional source
    selection (RandomDegreeSelectionStrategy.java: keep v with
    probability deg(v)/maxDeg, scale by f = n/|sample|) — selection
    made deterministic via an md5 Bernoulli so the DuckDB oracle
    replays it exactly (operators/betweenness.py:betweenness_centrality
    strategy='degree')."""
    from neo4j_graph_algorithms_spark.operators.betweenness import (
        betweenness_centrality,
    )

    e = _sub_edges(spark, sf_dir, 120)
    return betweenness_centrality(
        _vertices(e), e, strategy="degree", seed=42
    ).select("id", F.round("centrality", 4).alias("centrality"))


def _betweenness_sampled_oracle_sql(levels: int = 10, n_sub: int = 120,
                                    seed: int = 42) -> str:
    """The exact-betweenness triple-sum oracle restricted to the
    degree-sampled source set and scaled by n/|sample| — the same md5
    Bernoulli (h % 2^20)·maxDeg < deg·2^20 as the Spark operator, all
    integer arithmetic so the selection is bit-identical."""
    base = _betweenness_oracle_sql(levels, n_sub)
    head, tail = base.rsplit("\nSELECT", 1)
    assert tail.startswith(" n.id"), tail[:30]
    extra = (
        ",\ndegs AS (SELECT src AS id, count(*) AS deg FROM sub "
        "WHERE src <> dst GROUP BY src),\n"
        "sdeg AS (SELECT n.id, coalesce(d.deg, 0) AS deg "
        "FROM snodes n LEFT JOIN degs d ON d.id = n.id),\n"
        "mx AS (SELECT max(deg) AS m FROM sdeg),\n"
        "srcs AS (SELECT s.id FROM sdeg s, mx WHERE "
        "(CAST(('0x' || substr(md5(CAST(s.id AS VARCHAR) "
        f"|| '#btwdeg{seed}'), 1, 8)) AS BIGINT) % 1048576) * mx.m "
        "< s.deg * 1048576),\n"
        "fsc AS (SELECT CAST((SELECT count(*) FROM snodes) AS DOUBLE) "
        "/ (SELECT count(*) FROM srcs) AS f),\n"
        "sbc AS (SELECT a.v AS id, sum(a.sig * b.sig / c.sig) AS cent "
        "FROM sg a JOIN srcs ss ON ss.id = a.s "
        "JOIN sg b ON b.s = a.v AND a.d > 0 AND b.d > 0 "
        "JOIN sg c ON c.s = a.s AND c.v = b.v AND c.d = a.d + b.d "
        "GROUP BY a.v)"
    )
    return (
        head + extra
        + "\nSELECT n.id, round(coalesce(sbc.cent, 0.0) * fsc.f, 4) "
        "AS centrality FROM snodes n CROSS JOIN fsc "
        "LEFT JOIN sbc ON n.id = sbc.id"
    )


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core membership after 8 peel rounds (operators/kcore.py — the
    peel converges on this graph well before round 8, and a fixpoint is
    stable under further rounds, so the fixed-round oracle replay is
    exact). Returns the surviving (id) set."""
    from neo4j_graph_algorithms_spark.operators.kcore import k_core

    e = _edges(spark, sf_dir)
    return k_core(_vertices(e), e, 3, max_rounds=8).members


def _kcore_oracle_sql(k: int = 3, rounds: int = 8) -> str:
    parts = [
        _EDGES_CTE,
        _NODES_CTE,
        # MATERIALIZED: alive{t} is referenced three times in round t+1;
        # DuckDB would otherwise inline it and the plan grows 3^rounds
        "sym AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM edges WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM edges WHERE src <> dst))",
        "alive0 AS MATERIALIZED (SELECT id FROM nodes)",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"deg{t} AS (SELECT e.u AS id, COUNT(*) AS d FROM sym e "
            f"JOIN alive{t-1} x ON e.u = x.id "
            f"JOIN alive{t-1} y ON e.v = y.id GROUP BY e.u)")
        parts.append(
            f"alive{t} AS MATERIALIZED (SELECT a.id FROM alive{t-1} a "
            f"JOIN deg{t} d ON d.id = a.id AND d.d >= {k})")
    return "WITH " + ",\n".join(parts) + f"\nSELECT id FROM alive{rounds}"


def _q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby maximal independent set, 8 fixed rounds (operators/mis.py —
    the peel converges on this graph well before round 8 and a
    converged state is a fixpoint, so the fixed-round oracle replay is
    exact). Priorities are md5-keyed, identical on both engines."""
    from neo4j_graph_algorithms_spark.operators.mis import (
        maximal_independent_set,
    )

    e = _edges(spark, sf_dir)
    return maximal_independent_set(
        _vertices(e), e, seed=42, max_rounds=8).members


def _mis_oracle_sql(rounds: int = 8, seed: int = 42) -> str:
    """Unrolled Luby rounds (the k_core oracle pattern): per round the
    md5 priority key, the min-surviving-neighbor-key aggregation, the
    winner filter, and the winners+neighbors removal."""
    key = ("md5('{s}|{t}|' || CAST(id AS VARCHAR)) || '-' || "
           "lpad(CAST(id AS VARCHAR), 12, '0')")
    parts = [
        _EDGES_CTE,
        _NODES_CTE,
        "sym AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM edges WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM edges WHERE src <> dst))",
        "alive0 AS MATERIALIZED (SELECT id FROM nodes)",
    ]
    for t in range(1, rounds + 1):
        k = key.format(s=seed, t=t)
        parts.append(
            f"key{t} AS MATERIALIZED (SELECT id, {k} AS k "
            f"FROM alive{t-1})")
        parts.append(
            f"nm{t} AS (SELECT e.u AS id, min(kk.k) AS nk FROM sym e "
            f"JOIN alive{t-1} a ON e.u = a.id "
            f"JOIN alive{t-1} b ON e.v = b.id "
            f"JOIN key{t} kk ON kk.id = e.v GROUP BY e.u)")
        parts.append(
            f"win{t} AS MATERIALIZED (SELECT kk.id FROM key{t} kk "
            f"LEFT JOIN nm{t} nm ON nm.id = kk.id "
            f"WHERE nm.nk IS NULL OR kk.k < nm.nk)")
        parts.append(
            f"rem{t} AS (SELECT id FROM win{t} UNION "
            f"SELECT e.v FROM sym e JOIN win{t} w ON e.u = w.id "
            f"JOIN alive{t-1} b ON e.v = b.id)")
        parts.append(
            f"alive{t} AS MATERIALIZED (SELECT a.id FROM alive{t-1} a "
            f"LEFT JOIN rem{t} r ON r.id = a.id WHERE r.id IS NULL)")
    union = " UNION ALL ".join(
        f"SELECT id FROM win{t}" for t in range(1, rounds + 1))
    return "WITH " + ",\n".join(parts) + f"\nSELECT id FROM ({union})"


# the synthetic redirect domain for the resolve_redirects driver query:
# every node id not divisible by 32 forwards to id-1 (chains of up to
# 31 hops ending at the nearest multiple of 32), plus a deliberate
# 3-cycle on ids outside the node table. Pure arithmetic, identically
# constructible on both engines.
_REDIRECT_CYCLE = [(2000001, 2000002), (2000002, 2000003),
                   (2000003, 2000001)]


def _q_resolve_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution by pointer doubling
    (operators/redirects.py): 6 doubling rounds resolve chains up to 64
    hops (the synthetic domain's longest is 31); the planted 3-cycle
    stays flagged unresolved at exactly 2^6 hops — the same state a
    single-step walk capped at 64 hops reports, which is what the
    recursive-CTE oracle replays."""
    from neo4j_graph_algorithms_spark.operators.redirects import (
        resolve_redirects,
    )

    nodes = _vertices(_edges(spark, sf_dir))
    red = (
        nodes.filter(F.col("id") % 32 != 0)
        .select(F.col("id").alias("src"), (F.col("id") - 1).alias("dst"))
        .join(nodes.withColumnRenamed("id", "dst"), "dst", "leftsemi")
        .select("src", "dst")
        .union(spark.createDataFrame(_REDIRECT_CYCLE, "src long, dst long"))
    )
    return resolve_redirects(red, doubling_rounds=6)


def _redirects_oracle_sql(doubling_rounds: int = 6) -> str:
    cap = 2 ** doubling_rounds
    cyc = ", ".join(f"({a}, {b})" for a, b in _REDIRECT_CYCLE)
    return f"""
        WITH RECURSIVE {_EDGES_CTE}, {_NODES_CTE},
        red AS MATERIALIZED (
            SELECT n.id AS src, n.id - 1 AS dst FROM nodes n
            WHERE n.id % 32 <> 0
              AND EXISTS (SELECT 1 FROM nodes m WHERE m.id = n.id - 1)
            UNION ALL
            SELECT * FROM (VALUES {cyc}) t(src, dst)),
        f AS MATERIALIZED (
            SELECT src, min(dst) AS dst FROM red
            WHERE src <> dst GROUP BY src),
        walk(src, ptr, hops) AS (
            SELECT src, dst, CAST(1 AS BIGINT) FROM f
            UNION ALL
            SELECT w.src, n.dst, w.hops + 1
            FROM walk w JOIN f n ON n.src = w.ptr
            WHERE w.hops < {cap}),
        fin AS (SELECT src, ptr, hops, row_number() OVER (
                    PARTITION BY src ORDER BY hops DESC) AS rn
                FROM walk)
        SELECT fin.src, fin.ptr AS final_dst, fin.hops,
               CAST(CASE WHEN fin.ptr IN (SELECT src FROM f)
                    THEN 0 ELSE 1 END AS INTEGER) AS resolved
        FROM fin WHERE rn = 1
    """


def _q_greedy_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jones-Plassmann-style coloring by iterated Luby MIS on a 200-node
    subgraph: 4 color classes of 4 fixed inner rounds each (nested
    fixed bounds keep it SQL-replayable); vertices past the cap carry
    color -1 so the output is total."""
    from neo4j_graph_algorithms_spark.operators.mis import greedy_coloring

    e = _sub_edges(spark, sf_dir, 200)
    return greedy_coloring(_vertices(e), e, seed=42, max_colors=4,
                           mis_rounds=4)


def _coloring_oracle_sql(colors: int = 4, rounds: int = 4,
                         seed: int = 42, n_sub: int = 200) -> str:
    """Nested unroll: color c runs _mis_oracle_sql's round chain on the
    still-uncolored vertex set with seed+c·1000003."""
    key = ("md5('{s}|{t}|' || CAST(id AS VARCHAR)) || '-' || "
           "lpad(CAST(id AS VARCHAR), 12, '0')")
    parts = [
        _EDGES_CTE,
        f"sedges AS (SELECT src, dst FROM edges "
        f"WHERE src < {n_sub} AND dst < {n_sub})",
        "snodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM sedges "
        "UNION ALL SELECT dst FROM sedges))",
        "sym AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM sedges WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM sedges WHERE src <> dst))",
        "u0 AS MATERIALIZED (SELECT id FROM snodes)",
    ]
    for c in range(colors):
        s = seed + c * 1_000_003
        parts.append(
            f"c{c}a0 AS MATERIALIZED (SELECT id FROM u{c})")
        for t in range(1, rounds + 1):
            k = key.format(s=s, t=t)
            parts.append(
                f"c{c}key{t} AS MATERIALIZED (SELECT id, {k} AS k "
                f"FROM c{c}a{t-1})")
            parts.append(
                f"c{c}nm{t} AS (SELECT e.u AS id, min(kk.k) AS nk "
                f"FROM sym e JOIN c{c}a{t-1} a ON e.u = a.id "
                f"JOIN c{c}a{t-1} b ON e.v = b.id "
                f"JOIN c{c}key{t} kk ON kk.id = e.v GROUP BY e.u)")
            parts.append(
                f"c{c}win{t} AS MATERIALIZED (SELECT kk.id "
                f"FROM c{c}key{t} kk "
                f"LEFT JOIN c{c}nm{t} nm ON nm.id = kk.id "
                f"WHERE nm.nk IS NULL OR kk.k < nm.nk)")
            parts.append(
                f"c{c}rem{t} AS (SELECT id FROM c{c}win{t} UNION "
                f"SELECT e.v FROM sym e JOIN c{c}win{t} w ON e.u = w.id "
                f"JOIN c{c}a{t-1} b ON e.v = b.id)")
            parts.append(
                f"c{c}a{t} AS MATERIALIZED (SELECT a.id FROM c{c}a{t-1} a "
                f"LEFT JOIN c{c}rem{t} r ON r.id = a.id "
                f"WHERE r.id IS NULL)")
        wins = " UNION ALL ".join(
            f"SELECT id FROM c{c}win{t}" for t in range(1, rounds + 1))
        parts.append(f"mis{c} AS MATERIALIZED (SELECT id FROM ({wins}))")
        parts.append(
            f"u{c+1} AS MATERIALIZED (SELECT u.id FROM u{c} u "
            f"LEFT JOIN mis{c} m ON m.id = u.id WHERE m.id IS NULL)")
    classes = " UNION ALL ".join(
        f"SELECT id, {c} AS color FROM mis{c}" for c in range(colors))
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, CAST(color AS INTEGER) AS color FROM ({classes} "
        f"UNION ALL SELECT id, -1 FROM u{colors})"
    )


def _q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.operators.scc import (
        strongly_connected_components,
    )

    e = _sub_edges(spark, sf_dir, 300)
    return strongly_connected_components(_vertices(e), e).components


def _q_balanced_triads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signed weights derived deterministically: +1 when src+dst even."""
    from neo4j_graph_algorithms_spark.operators.triangles import balanced_triads

    e = _edges(spark, sf_dir).withColumn(
        "weight",
        F.when((F.col("src") + F.col("dst")) % 2 == 0, F.lit(1.0))
        .otherwise(F.lit(-1.0)),
    )
    return balanced_triads(_vertices(e), e)


def _q_spanning_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    # oracle-checked via the cycle property: with the deterministic
    # distinct total order (weight, lo, hi), edge e = (u,v) is in the
    # unique MST iff the minimax path key between u and v equals e's own
    # key — and minimax closures ARE SQL-expressible by min-max pointer
    # doubling (_spanning_oracle_sql)
    from neo4j_graph_algorithms_spark.operators.spanning import spanning_tree

    e = _edges_weighted(spark, sf_dir).filter(
        (F.col("src") < 300) & (F.col("dst") < 300)
    )
    res = spanning_tree(_vertices(e), e, start_node=0)
    return res.edges.select("lo", "hi", F.round("weight", 6).alias("weight"))


def _spanning_oracle_sql(rounds: int = 10, n_sub: int = 300) -> str:
    """MST-from-start-component oracle. Key encoding: weights are
    integral multiplicities and lo/hi < n_sub, so
    key = w*n_sub² + lo*n_sub + hi is a distinct total order identical
    to the operator's (weight, lo, hi) struct tie-break
    (operators/spanning.py:_canon_weighted + keyed). Cycle property:
    e=(lo,hi) ∈ unique MST ⇔ minimax-path-key(lo,hi) = key(e), where
    minimax(u,v) = min over u→v paths of the max edge key — computed by
    min-max pointer doubling over the undirected view (self rows carry
    key 0 so shorter paths survive each squaring). Restricted to the
    start node 0's component (Prim semantics), exactly like the Spark
    query."""
    n2 = n_sub * n_sub
    parts = [
        _WEDGES_CTE,
        f"swe AS MATERIALIZED (SELECT * FROM wedges "
        f"WHERE src < {n_sub} AND dst < {n_sub})",
        "canon AS MATERIALIZED (SELECT least(src, dst) AS lo, "
        "greatest(src, dst) AS hi, min(weight) AS w FROM swe "
        "WHERE src <> dst GROUP BY 1, 2)",
        f"keyed AS MATERIALIZED (SELECT lo, hi, w, "
        f"w * {n2} + lo * {n_sub} + hi AS k FROM canon)",
        "m0 AS MATERIALIZED ("
        "SELECT lo AS u, hi AS v, k FROM keyed "
        "UNION ALL SELECT hi, lo, k FROM keyed "
        "UNION ALL SELECT id, id, 0.0 FROM "
        "(SELECT DISTINCT lo AS id FROM canon "
        " UNION SELECT DISTINCT hi FROM canon))",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT a.u, b.v, "
            f"min(CASE WHEN a.k > b.k THEN a.k ELSE b.k END) AS k "
            f"FROM m{i-1} a JOIN m{i-1} b ON a.v = b.u GROUP BY a.u, b.v)"
        )
    parts.append(
        f"conn0 AS MATERIALIZED (SELECT v AS id FROM m{rounds} WHERE u = 0)")
    return (
        "WITH " + ",\n".join(parts)
        + f"""
        SELECT e.lo, e.hi, round(e.w, 6) AS weight
        FROM keyed e
        JOIN m{rounds} mm ON mm.u = e.lo AND mm.v = e.hi
        JOIN conn0 ON conn0.id = e.lo
        WHERE mm.k = e.k
        """
    )


def _q_k_spanning_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-spanning-tree clustering (algo.spanningTree.kmin,
    KSpanningTree.java): MST from node 0 on the id<300 weighted
    subgraph, cut the k−1=4 heaviest tree edges (ties by (lo, hi)),
    label the 5 clusters by min member id. Oracle = the cycle-property
    MST (same minimax doubling as spanning_tree) + the same
    deterministic cut + reachability-doubling min-label components."""
    from neo4j_graph_algorithms_spark.operators.spanning import (
        k_spanning_tree,
    )

    e = _edges_weighted(spark, sf_dir).filter(
        (F.col("src") < 300) & (F.col("dst") < 300)
    )
    return k_spanning_tree(_vertices(e), e, 5, start_node=0)


def _k_spanning_oracle_sql(k: int = 5, rounds: int = 10,
                           n_sub: int = 300) -> str:
    """k-spanning-tree oracle: the unique (tie-broken) MST of node 0's
    component via the cycle property (see _spanning_oracle_sql), minus
    the k−1 heaviest tree edges ordered (weight DESC, lo, hi) — the
    operator's cut_key total order — then min-member-id connected
    components of the kept tree edges by reachability doubling."""
    n2 = n_sub * n_sub
    parts = [
        _WEDGES_CTE,
        f"swe AS MATERIALIZED (SELECT * FROM wedges "
        f"WHERE src < {n_sub} AND dst < {n_sub})",
        "canon AS MATERIALIZED (SELECT least(src, dst) AS lo, "
        "greatest(src, dst) AS hi, min(weight) AS w FROM swe "
        "WHERE src <> dst GROUP BY 1, 2)",
        f"keyed AS MATERIALIZED (SELECT lo, hi, w, "
        f"w * {n2} + lo * {n_sub} + hi AS k FROM canon)",
        "m0 AS MATERIALIZED ("
        "SELECT lo AS u, hi AS v, k FROM keyed "
        "UNION ALL SELECT hi, lo, k FROM keyed "
        "UNION ALL SELECT id, id, 0.0 FROM "
        "(SELECT DISTINCT lo AS id FROM canon "
        " UNION SELECT DISTINCT hi FROM canon))",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT a.u, b.v, "
            f"min(CASE WHEN a.k > b.k THEN a.k ELSE b.k END) AS k "
            f"FROM m{i-1} a JOIN m{i-1} b ON a.v = b.u GROUP BY a.u, b.v)"
        )
    parts += [
        f"conn0 AS MATERIALIZED (SELECT v AS id FROM m{rounds} WHERE u = 0)",
        f"tree AS MATERIALIZED (SELECT e.lo, e.hi, e.w FROM keyed e "
        f"JOIN m{rounds} mm ON mm.u = e.lo AND mm.v = e.hi "
        f"JOIN conn0 ON conn0.id = e.lo WHERE mm.k = e.k)",
        f"cut AS MATERIALIZED (SELECT lo, hi FROM tree "
        f"ORDER BY w DESC, lo, hi LIMIT {max(k - 1, 0)})",
        "kept AS MATERIALIZED (SELECT t.lo, t.hi FROM tree t "
        "WHERE NOT EXISTS (SELECT 1 FROM cut c "
        "WHERE c.lo = t.lo AND c.hi = t.hi))",
        "knodes AS MATERIALIZED (SELECT DISTINCT id FROM ("
        "SELECT lo AS id FROM tree UNION ALL SELECT hi FROM tree "
        "UNION ALL SELECT CAST(0 AS BIGINT)))",
        "r0 AS MATERIALIZED (SELECT lo AS u, hi AS v FROM kept "
        "UNION ALL SELECT hi, lo FROM kept "
        "UNION ALL SELECT id, id FROM knodes)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT DISTINCT a.u, b.v "
            f"FROM r{i-1} a JOIN r{i-1} b ON a.v = b.u)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT CAST(u AS BIGINT) AS id, "
        f"CAST(min(v) AS BIGINT) AS cluster FROM r{rounds} GROUP BY u"
    )


def _q_louvain_onelevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Louvain level, exactly 4 parity rounds — deterministic, so
    (unlike the full multi-level `louvain` query) fully oracle-checked
    against the unrolled per-round SQL below."""
    from neo4j_graph_algorithms_spark.operators.louvain import (
        louvain_one_level,
    )

    e = _sub_edges(spark, sf_dir)
    return louvain_one_level(_vertices(e), e, rounds=4)


def _louvain_onelevel_sql(rounds: int, final_select: str | None = None,
                          extra_ctes: list[str] | None = None) -> str:
    """Unrolled one-level Louvain: per round, votes (v→neighbor-community
    weight) → Σ_tot → gain → argmax pick → parity-gated moves → next
    labels. All arithmetic is IEEE-double over integer-valued operands in
    the same association order as the Spark operator, so gains (and the
    min-community tie-break on exact ties) agree bit-for-bit.
    ``extra_ctes``/``final_select`` let composing oracles (per-community
    conductance) build on ``lab{rounds}``."""
    parts = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT CAST(l_orderkey % {N_MOD} AS BIGINT) AS src, "
        f"CAST(l_partkey % {N_MOD} AS BIGINT) AS dst FROM lineitem)",
        f"se AS MATERIALIZED (SELECT src, dst FROM e0 WHERE src < {SUB_N} AND dst < {SUB_N})",
        # _sym_weighted: unit weights, reverse non-loops, sum
        "sym AS MATERIALIZED (SELECT src, dst, CAST(sum(w) AS DOUBLE) AS weight FROM ("
        "SELECT src, dst, 1.0 AS w FROM se UNION ALL "
        "SELECT dst AS src, src AS dst, 1.0 AS w FROM se WHERE src <> dst"
        ") GROUP BY src, dst)",
        "verts AS MATERIALIZED (SELECT src AS id FROM se UNION SELECT dst FROM se)",
        "e AS MATERIALIZED (SELECT * FROM sym WHERE src <> dst)",
        "selfw AS MATERIALIZED (SELECT src AS id, 2.0 * weight AS sw FROM sym WHERE src = dst)",
        # kv exactly as the operator: inner (grouped + self) then outer coalesce
        "kvi AS MATERIALIZED (SELECT g.id, g._k + coalesce(s.sw, 0.0) AS k FROM "
        "(SELECT src AS id, sum(weight) AS _k FROM e GROUP BY src) g "
        "LEFT JOIN selfw s ON s.id = g.id)",
        "kv AS MATERIALIZED (SELECT v.id, coalesce(kvi.k, 0.0) AS k "
        "FROM verts v LEFT JOIN kvi ON kvi.id = v.id)",
        "tm AS MATERIALIZED (SELECT sum(CASE WHEN src = dst THEN 2.0 * weight "
        "ELSE weight END) AS m2 FROM sym)",
        "lab0 AS MATERIALIZED (SELECT id, id AS community FROM verts)",
    ]
    parts += _louvain_rounds_sql(rounds, tag="", e="e", kv="kv", tm="tm")
    parts += extra_ctes or []
    tail = final_select or f"SELECT id, community FROM lab{rounds}"
    return "WITH " + ",\n".join(parts) + "\n" + tail


def _louvain_rounds_sql(rounds: int, *, tag: str, e: str, kv: str,
                        tm: str) -> list[str]:
    """Per-round CTEs for one Louvain level (votes → Σ_tot → gain →
    argmax pick → parity-gated moves → next labels), with a name ``tag``
    so two levels can coexist in one statement. Labels flow
    ``{tag}lab{r}`` → ``{tag}lab{r+1}``; the caller supplies
    ``{tag}lab0`` plus the ``e``/``kv``/``tm`` CTE names."""
    parts = []
    for r in range(rounds):
        p = r % 2
        parts += [
            f"{tag}votes{r} AS MATERIALIZED (SELECT e.src AS id, l.community AS cand, "
            f"sum(e.weight) AS k_in FROM {e} e JOIN {tag}lab{r} l ON l.id = e.dst GROUP BY 1, 2)",
            f"{tag}tot{r} AS MATERIALIZED (SELECT l.community, sum({kv}.k) AS tot "
            f"FROM {tag}lab{r} l JOIN {kv} ON {kv}.id = l.id GROUP BY 1)",
            f"{tag}gains{r} AS MATERIALIZED (SELECT v.id, v.cand, c.community, {kv}.k, "
            f"v.k_in / ({tm}.m2 / 2.0) - 1.0 * {kv}.k * "
            f"(CASE WHEN v.cand = c.community THEN t.tot - {kv}.k ELSE t.tot END) "
            f"/ (({tm}.m2 / 2.0) * {tm}.m2) AS gain "
            f"FROM {tag}votes{r} v JOIN {tag}lab{r} c ON c.id = v.id "
            f"JOIN {kv} ON {kv}.id = v.id JOIN {tag}tot{r} t ON t.community = v.cand "
            f"CROSS JOIN {tm})",
            f"{tag}pick{r} AS MATERIALIZED (SELECT * FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY id ORDER BY gain DESC, cand ASC) AS _rk FROM {tag}gains{r}) "
            f"WHERE _rk = 1)",
            f"{tag}stay{r} AS MATERIALIZED (SELECT id, gain AS _stay FROM {tag}gains{r} "
            f"WHERE cand = community)",
            f"{tag}moves{r} AS MATERIALIZED (SELECT p.id, p.cand FROM {tag}pick{r} p "
            f"LEFT JOIN {tag}stay{r} s ON s.id = p.id "
            f"WHERE p.cand <> p.community AND p.gain > coalesce(s._stay, 0.0) + 1e-12 "
            f"AND p.id % 2 = {p})",
            f"{tag}lab{r + 1} AS MATERIALIZED (SELECT l.id, "
            f"coalesce(m.cand, l.community) AS community "
            f"FROM {tag}lab{r} l LEFT JOIN {tag}moves{r} m ON m.id = l.id)",
        ]
    return parts


def _q_louvain_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two fixed-rounds Louvain levels + coarsening, canonical min-member
    labels — the coarsening path of the multi-level operator under a
    deterministic fixed-rounds schedule, fully oracle-checked by
    _louvain_twolevel_sql (coarse weights stay integer-valued doubles,
    so gains agree bit-for-bit across both levels)."""
    from neo4j_graph_algorithms_spark.operators.louvain import (
        louvain_two_level,
    )

    e = _sub_edges(spark, sf_dir)
    return louvain_two_level(_vertices(e), e, rounds1=4, rounds2=4)


def _louvain_twolevel_sql(r1: int, r2: int) -> str:
    """Unrolled two-level Louvain: the one-level prefix + ``r1`` rounds,
    community coarsening (intra weight → self-loop, 2m-invariant double
    weighting before the /2), level-2 prelude (kv/tm over the coarse
    graph) + ``r2`` rounds, projection to original ids, min-member
    canonicalization."""
    parts = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT CAST(l_orderkey % {N_MOD} AS BIGINT) AS src, "
        f"CAST(l_partkey % {N_MOD} AS BIGINT) AS dst FROM lineitem)",
        f"se AS MATERIALIZED (SELECT src, dst FROM e0 WHERE src < {SUB_N} AND dst < {SUB_N})",
        "sym AS MATERIALIZED (SELECT src, dst, CAST(sum(w) AS DOUBLE) AS weight FROM ("
        "SELECT src, dst, 1.0 AS w FROM se UNION ALL "
        "SELECT dst AS src, src AS dst, 1.0 AS w FROM se WHERE src <> dst"
        ") GROUP BY src, dst)",
        "verts AS MATERIALIZED (SELECT src AS id FROM se UNION SELECT dst FROM se)",
        "e AS MATERIALIZED (SELECT * FROM sym WHERE src <> dst)",
        "selfw AS MATERIALIZED (SELECT src AS id, 2.0 * weight AS sw FROM sym WHERE src = dst)",
        "kvi AS MATERIALIZED (SELECT g.id, g._k + coalesce(s.sw, 0.0) AS k FROM "
        "(SELECT src AS id, sum(weight) AS _k FROM e GROUP BY src) g "
        "LEFT JOIN selfw s ON s.id = g.id)",
        "kv AS MATERIALIZED (SELECT v.id, coalesce(kvi.k, 0.0) AS k "
        "FROM verts v LEFT JOIN kvi ON kvi.id = v.id)",
        "tm AS MATERIALIZED (SELECT sum(CASE WHEN src = dst THEN 2.0 * weight "
        "ELSE weight END) AS m2 FROM sym)",
        "lab0 AS MATERIALIZED (SELECT id, id AS community FROM verts)",
    ]
    parts += _louvain_rounds_sql(r1, tag="", e="e", kv="kv", tm="tm")
    parts += [
        # coarsen (inherited self-loops weighted double before the /2 so
        # 2m is invariant — mirrors operators/louvain.py coarsening)
        f"co AS MATERIALIZED (SELECT ls.community AS src, ld.community AS dst, "
        f"sum(CASE WHEN s.src = s.dst THEN 2.0 * s.weight ELSE s.weight END) AS w0 "
        f"FROM sym s JOIN lab{r1} ls ON ls.id = s.src "
        f"JOIN lab{r1} ld ON ld.id = s.dst GROUP BY 1, 2)",
        "sym2 AS MATERIALIZED (SELECT src, dst, "
        "CASE WHEN src = dst THEN w0 / 2.0 ELSE w0 END AS weight FROM co)",
        f"verts2 AS MATERIALIZED (SELECT DISTINCT community AS id FROM lab{r1})",
        "e2 AS MATERIALIZED (SELECT * FROM sym2 WHERE src <> dst)",
        "selfw2 AS MATERIALIZED (SELECT src AS id, 2.0 * weight AS sw FROM sym2 WHERE src = dst)",
        "kvi2 AS MATERIALIZED (SELECT g.id, g._k + coalesce(s.sw, 0.0) AS k FROM "
        "(SELECT src AS id, sum(weight) AS _k FROM e2 GROUP BY src) g "
        "LEFT JOIN selfw2 s ON s.id = g.id)",
        "kv2 AS MATERIALIZED (SELECT v.id, coalesce(kvi2.k, 0.0) AS k "
        "FROM verts2 v LEFT JOIN kvi2 ON kvi2.id = v.id)",
        "tm2 AS MATERIALIZED (SELECT sum(CASE WHEN src = dst THEN 2.0 * weight "
        "ELSE weight END) AS m2 FROM sym2)",
        "L2lab0 AS MATERIALIZED (SELECT id, id AS community FROM verts2)",
    ]
    parts += _louvain_rounds_sql(r2, tag="L2", e="e2", kv="kv2", tm="tm2")
    parts += [
        f"map2 AS MATERIALIZED (SELECT l1.id, l2.community FROM lab{r1} l1 "
        f"JOIN L2lab{r2} l2 ON l2.id = l1.community)",
        "canon AS MATERIALIZED (SELECT community, min(id) AS c FROM map2 "
        "GROUP BY community)",
    ]
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT m.id, c.c AS community FROM map2 m "
            "JOIN canon c ON c.community = m.community")


def _q_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # modularity-optimal communities are not SQL-expressible → rows-only;
    # move rounds capped (each round is several Spark jobs and the dense
    # induced subgraph converges semantically within a few sweeps)
    from neo4j_graph_algorithms_spark.operators.louvain import louvain

    e = _sub_edges(spark, sf_dir)
    return louvain(
        _vertices(e), e, max_levels=2, max_moves_per_level=6
    ).communities


def _q_louvain_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic driver evidence for the data-dependent Louvain path
    (VERDICT r3 next-round #6): the labels themselves are not
    SQL-expressible, but the INVARIANTS every correct Louvain run
    satisfies are — per-level modularity (computed relationally from
    the emitted labels + original edges by operators/louvain.py:
    modularity) non-decreasing across levels, final modularity within
    the mathematical bounds [-1/2, 1], and the output a valid
    partition (exactly one community row per vertex). The oracle knows
    the vertex count independently and pins the booleans TRUE — a run
    that breaks monotonicity or drops/duplicates a vertex goes red."""
    from neo4j_graph_algorithms_spark.operators.louvain import louvain

    e = _sub_edges(spark, sf_dir)
    v = _vertices(e)
    res = louvain(v, e, max_levels=2, max_moves_per_level=6)
    mods = res.modularities
    monotone = all(mods[i + 1] >= mods[i] - 1e-9
                   for i in range(len(mods) - 1))
    in_bounds = all(-0.5 - 1e-9 <= m <= 1.0 + 1e-9 for m in mods)
    rows = res.communities.count()
    distinct_ids = res.communities.select("id").distinct().count()
    return spark.createDataFrame(
        [(int(rows), int(distinct_ids), bool(monotone), bool(in_bounds),
          int(len(mods)))],
        "n_rows long, n_distinct_ids long, modularity_monotone boolean, "
        "modularity_in_bounds boolean, n_levels long")


def _louvain_invariants_oracle_sql(max_levels: int = 2) -> str:
    """The oracle side knows |V| of the subgraph without running
    Louvain; the booleans are the invariant pins. n_levels is bounded
    by max_levels and ≥1 on a non-empty graph — pinned exactly because
    this fixture coarsens below max_levels only by converging, which
    the operator only reports via len(modularities); a wrong level
    count here means the loop structure changed."""
    return f"""
        WITH {_sub_cte(SUB_N)}, {_SNODES_CTE},
        nv AS (SELECT count(*) AS n FROM snodes)
        SELECT n AS n_rows, n AS n_distinct_ids,
               TRUE AS modularity_monotone,
               TRUE AS modularity_in_bounds,
               CAST({max_levels} AS BIGINT) AS n_levels
        FROM nv
    """


def _q_euclidean_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.operators.similarity import (
        euclidean_vectors,
    )

    emb = _t(spark, sf_dir, "embeddings")
    items = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("item"),
        F.col("embedding").cast("array<double>").alias("vector"),
    )
    return euclidean_vectors(items).select(
        "item1", "item2", F.round("distance", 5).alias("distance")
    )


def _q_pearson_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.operators.similarity import (
        pearson_vectors,
    )

    emb = _t(spark, sf_dir, "embeddings")
    items = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("item"),
        F.col("embedding").cast("array<double>").alias("vector"),
    )
    return pearson_vectors(items).select(
        "item1", "item2", F.round("similarity", 5).alias("similarity")
    )


# ---- pipeline: documents / embeddings / events ----------------------------


def _q_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic per-language Bernoulli downsample (en 0.5, zh 0.25,
    # everything else kept) — the hash threshold is a pure function of
    # (doc_id, seed), so the DuckDB oracle replays the identical rows
    from neo4j_graph_algorithms_spark.pipeline.sampling import sample_documents

    docs = _t(spark, sf_dir, "documents")
    return sample_documents(
        docs, by="lang", fractions={"en": 0.5, "zh": 0.25}, seed=0
    ).select("doc_id", "lang")


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exactly 10 docs per language, hash-ordered (deterministic)
    from neo4j_graph_algorithms_spark.pipeline.sampling import (
        stratified_sample_exact,
    )

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample_exact(docs, 10, by="lang", seed=0).select(
        "doc_id", "lang")


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.dedup import exact_duplicates

    return exact_duplicates(_t(spark, sf_dir, "documents"))


def _q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.dedup import minhash_signatures

    # oracle-matched small config (production default is 128 perms)
    return minhash_signatures(_t(spark, sf_dir, "documents"), n_hashes=4)


def _q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.dedup import minhash_lsh_candidates

    # oracle-matched small config (production default is 128 perms × 16 bands)
    return minhash_lsh_candidates(_t(spark, sf_dir, "documents"),
                                  n_hashes=4, bands=2)


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup: MinHash-LSH candidate pairs → connected
    components over the pair graph → one canonical survivor per cluster
    (highest whitespace-token count, ties lowest doc_id). Oracle replays
    the LSH join + a recursive-CTE min-label WCC + a ranked canonical
    pick in pure SQL."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        dedup_clusters, minhash_lsh_candidates, tokens_expr)

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, n_hashes=4, bands=2)
    docs_q = docs.withColumn("n_tokens", F.size(tokens_expr(F.col("text"))))
    return dedup_clusters(docs_q, pairs, quality_col="n_tokens")


def _q_ensemble_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal dedup (pipeline/dedup.py:ensemble_dedup_clusters):
    exact-text star edges ∪ MinHash-LSH bands ∪ SimHash Hamming<=3
    candidates → WCC clusters → quality-ranked canonical. Oracle
    replays all three candidate joins + the recursive min-label WCC."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        ensemble_dedup_clusters, tokens_expr)

    docs = _t(spark, sf_dir, "documents")
    docs_q = docs.withColumn("n_tokens", F.size(tokens_expr(F.col("text"))))
    return ensemble_dedup_clusters(
        docs_q, quality_col="n_tokens", n_hashes=4, bands=2,
        simhash_bits=16, max_hamming=3, simhash_bands=4)


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.dedup import token_jaccard_pairs

    return token_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


def _q_ngram3_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs: unit = word 3-gram shingles
    (order-sensitive — shuffled text shares tokens but not shingles)."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import token_jaccard_pairs

    return token_jaccard_pairs(_t(spark, sf_dir, "documents"),
                               threshold=0.8, ngram=3)


def _q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: token-set MAX-containment |A∩B|/min(|A|,|B|)
    ≥ 0.8 (pipeline/dedup.py:containment_pairs — Broder's containment;
    catches a short doc nested in a long one that Jaccard misses)."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        containment_pairs,
    )

    return containment_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


def _q_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: 16 deterministic coarse cells, 4 probed per query —
    the scale path next to cosine_knn's exact baseline."""
    from neo4j_graph_algorithms_spark.pipeline.ann import ivf_knn

    return ivf_knn(_t(spark, sf_dir, "embeddings"),
                   n_queries=20, k=5, n_centroids=16, n_probe=4)


def _q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=8, 3 fixed rounds, md5-sample init) — final
    labels. Integer output, but the oracle match is a full float-parity
    proof: one flipped distance comparison anywhere in 4 assignment
    passes flips a label (pipeline/kmeans.py:kmeans_fit)."""
    from neo4j_graph_algorithms_spark.pipeline.kmeans import kmeans_fit

    res = kmeans_fit(_t(spark, sf_dir, "embeddings"), k=8, iterations=3)
    return res.assignments.select("id", "cluster").withColumnRenamed(
        "id", "vec_id")


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space dedup: one survivor per k-means cluster (nearest
    centroid, ties to smaller id) — the embedding-modality counterpart
    of dedup_clusters (pipeline/kmeans.py:semantic_dedup)."""
    from neo4j_graph_algorithms_spark.pipeline.kmeans import semantic_dedup

    return semantic_dedup(_t(spark, sf_dir, "embeddings"), k=8, iterations=3)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.dedup import simhash_signatures

    # oracle-matched small config (production default is 64 bits)
    return simhash_signatures(_t(spark, sf_dir, "documents"), n_bits=16)


def _q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded Hamming near-dup pairs — pigeonhole-complete at
    n_bands = max_hamming + 1, so the exhaustive oracle matches."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import simhash_near_dup

    return simhash_near_dup(_t(spark, sf_dir, "documents"),
                            n_bits=16, max_hamming=3, n_bands=4)


def _q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.text import bpe_token_stats

    return bpe_token_stats(_t(spark, sf_dir, "documents"))


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.text import token_stats

    return token_stats(_t(spark, sf_dir, "documents"))


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.text import quality_scores

    return quality_scores(_t(spark, sf_dir, "documents"))


def _q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.text import language_id

    return language_id(_t(spark, sf_dir, "documents"))


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.text import fingerprints

    return fingerprints(_t(spark, sf_dir, "documents"))


def _q_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.text import one_hot_lang

    return one_hot_lang(_t(spark, sf_dir, "documents"))


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (top-bigram / dup-bigram
    fractions + longest token run) — shuffle-free in-row array
    expressions (pipeline/text.py:repetition_scores)."""
    from neo4j_graph_algorithms_spark.pipeline.text import repetition_scores

    return repetition_scores(_t(spark, sf_dir, "documents"))


def _q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc repeated-substring signal (Lee et al. 2022, chunked
    k=20): duplicated fraction of non-overlapping 20-char chunks
    (pipeline/dedup.py:duplicate_span_scores)."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        duplicate_span_scores,
    )

    return duplicate_span_scores(_t(spark, sf_dir, "documents"), k=20)


def _q_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style char-trigram LM cross-entropy quality score (add-1
    smoothing, self-trained) — model-sized broadcast joins only
    (pipeline/text.py:ngram_lm_score)."""
    from neo4j_graph_algorithms_spark.pipeline.text import ngram_lm_score

    return ngram_lm_score(_t(spark, sf_dir, "documents"))


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark n-gram decontamination: 3-gram overlap of every corpus
    doc against a deterministic 20-doc benchmark sample; eval side
    broadcast (pipeline/decontam.py:ngram_decontaminate)."""
    from neo4j_graph_algorithms_spark.pipeline.decontam import (
        ngram_decontaminate,
    )

    return ngram_decontaminate(
        _t(spark, sf_dir, "documents"), n=3, eval_k=20, threshold=0.2
    )


def _q_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation chain — the composition real pipelines run,
    each stage an already-oracle-checked operator: synthesize PII →
    pii_scrub → C4 gate over the SCRUBBED text (min_words=40,
    mean_word_len ≤ 4.5, blocklist dup/slow) → exact dedup keeping the
    min-doc_id survivor per scrubbed fingerprint. Output =
    (doc_id, lang, source) of the surviving corpus; the oracle chains
    the same CTE fragments verbatim."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import exact_duplicates
    from neo4j_graph_algorithms_spark.pipeline.filtering import (
        c4_quality_filter, pii_scrub,
    )

    d = _t(spark, sf_dir, "documents")
    synth = d.select(
        "doc_id", "lang", "source",
        F.concat(
            F.col("text"), F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1-555-"),
            F.col("doc_id").cast("string"),
            F.lit(" at 10."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 end"),
        ).alias("text"),
    )
    scrubbed = synth.select("doc_id", "lang", "source").join(
        pii_scrub(synth).select(
            "doc_id", F.col("clean_text").alias("text")),
        "doc_id")
    flags = c4_quality_filter(
        scrubbed, min_words=40, max_mean_word_len=4.5,
        blocklist=("dup", "slow"))
    kept = scrubbed.join(
        flags.filter(F.col("keep")).select("doc_id"), "doc_id")
    survivors = exact_duplicates(kept).select(
        F.col("min_doc_id").alias("doc_id"))
    # survivor list is corpus-scale — plain doc-keyed semi join, never
    # a broadcast
    return kept.join(survivors, "doc_id", "left_semi").select(
        "doc_id", "lang", "source")


def _q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The algo.isFinite/isInfinite/NaN/Infinity + oneHotEncoding scalar
    surface (functions/scalars.py; utils/IsFiniteFunc.java:27-45,
    ml/OneHotEncoding.java:33) exercised over documents: a synthesized
    double hits ±Infinity/NaN/finite branches per doc_id residue; the
    one-hot vector is emitted as a compact 0/1 string (array columns
    don't hash portably in the driver compare)."""
    from neo4j_graph_algorithms_spark.functions.scalars import (
        infinity, is_finite, is_infinite, nan, one_hot,
    )
    from neo4j_graph_algorithms_spark.pipeline.text import LANGS

    d = _t(spark, sf_dir, "documents")
    x = (
        F.when(F.col("doc_id") % 5 == 0, infinity())
        .when(F.col("doc_id") % 5 == 1, -infinity())
        .when(F.col("doc_id") % 5 == 2, nan())
        .otherwise(F.col("n_chars").cast("double") / 7.0)
    )
    oh = one_hot(F.array(*[F.lit(lg) for lg in LANGS]),
                 F.array(F.col("lang")))
    return d.select(
        "doc_id",
        is_finite(x).alias("finite"),
        is_infinite(x).alias("infinite"),
        F.concat_ws("", F.transform(oh, lambda v: v.cast("string")))
        .alias("one_hot"),
    )


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents with synthesized PII (the corpus
    has none — a deterministic email/phone/IP per doc_id de-vacuates
    the check; pipeline/filtering.py:pii_scrub). Three sequential
    codegen'd regexp passes, map-only."""
    from neo4j_graph_algorithms_spark.pipeline.filtering import pii_scrub

    d = _t(spark, sf_dir, "documents")
    synth = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1-555-"),
            F.col("doc_id").cast("string"),
            F.lit(" at 10."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 end"),
        ).alias("text"),
    )
    out = pii_scrub(synth)
    return out.select(
        "doc_id", "clean_text",
        F.col("n_emails").cast("long").alias("n_emails"),
        F.col("n_ips").cast("long").alias("n_ips"),
        F.col("n_phones").cast("long").alias("n_phones"),
    )


def _q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality gate (word-count band, mean-word-length cap,
    blocklist) — every row kept with its keep flag so the oracle hash
    proves each rule (pipeline/filtering.py:c4_quality_filter)."""
    from neo4j_graph_algorithms_spark.pipeline.filtering import (
        c4_quality_filter,
    )

    return c4_quality_filter(
        _t(spark, sf_dir, "documents"),
        min_words=40, max_mean_word_len=4.5, blocklist=("dup", "slow"),
    )


def _q_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture sampling: 4 sources to exact 40/30/20/10
    proportions at the largest supportable total, survivors by
    deterministic hash order (pipeline/sampling.py:mix_corpus)."""
    from neo4j_graph_algorithms_spark.pipeline.sampling import mix_corpus

    return mix_corpus(
        _t(spark, sf_dir, "documents"),
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
    )


def _q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mT5/XLM-R temperature mixing by lang at alpha=0.5: stratum share
    ∝ √n, survivors by deterministic hash order
    (pipeline/sampling.py:temperature_mix)."""
    from neo4j_graph_algorithms_spark.pipeline.sampling import (
        temperature_mix,
    )

    return temperature_mix(_t(spark, sf_dir, "documents"),
                           by="lang", alpha=0.5)


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: per-doc chunk span in the
    concatenated 256-token-chunk stream via the two-phase sharded
    prefix sum (pipeline/packing.py:pack_sequences); the oracle is the
    single global window cumsum it must equal exactly."""
    from neo4j_graph_algorithms_spark.pipeline.packing import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), budget=256)


def _q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build, top-40 by (count DESC, token ASC) with dense
    ids — histogram-thresholded before the ranking window
    (pipeline/index.py:build_vocab)."""
    from neo4j_graph_algorithms_spark.pipeline.index import build_vocab

    return build_vocab(_t(spark, sf_dir, "documents"), max_size=40)


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document; 9-dp-rounded scores rank on
    both engines so a ≤1-ulp ln() difference can't flip a rank
    (pipeline/index.py:tfidf_top_terms)."""
    from neo4j_graph_algorithms_spark.pipeline.index import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


def _q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped inverted index: sorted posting arrays (≤50 doc ids per
    token, capped by a rank window BEFORE collecting) + true df
    (pipeline/index.py:inverted_index). The postings array is emitted
    as a comma-joined string: array columns are unhashable in the
    driver's pandas sort (the r4 red row) — the library keeps the
    typed array; only this proof row serializes it."""
    from neo4j_graph_algorithms_spark.pipeline.index import inverted_index

    out = inverted_index(_t(spark, sf_dir, "documents"), max_postings=50)
    return out.select(
        "token", "df",
        F.array_join(F.col("postings").cast("array<string>"), ",")
        .alias("postings"))


def _q_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence PMI (window 3, min_count 2) — pair
    instances generated IN-ROW with nested array transforms, never a
    positional explode+self-join (pipeline/index.py:cooccurrence_pmi);
    the oracle uses the self-join, proving the in-row expansion."""
    from neo4j_graph_algorithms_spark.pipeline.index import cooccurrence_pmi

    out = cooccurrence_pmi(_t(spark, sf_dir, "documents"),
                           window=3, min_count=2)
    return out.select("term_a", "term_b", "n_pair",
                      F.round("pmi", 6).alias("pmi"))


def _q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log2-bucketed out/in-degree histogram — the power-law shape
    check (operators/graphstats.py:degree_histogram)."""
    from neo4j_graph_algorithms_spark.operators.graphstats import (
        degree_histogram,
    )

    return degree_histogram(_edges(spark, sf_dir))


def _q_community_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NMI/ARI between two deterministic labelings (id%5 vs id%3) of
    the driver graph's nodes (operators/metrics.py): exercises the
    contingency/marginal/entropy pipeline with a closed-form SQL
    replay. Real usage compares detector outputs (LPA vs Louvain vs
    ground truth); the arithmetic labelings keep the oracle
    self-contained."""
    from neo4j_graph_algorithms_spark.operators.metrics import (
        community_compare,
    )

    e = _edges(spark, sf_dir)
    v = _vertices(e)
    a = v.select("id", (F.col("id") % 5).alias("label"))
    b = v.select("id", (F.col("id") % 3).alias("label"))
    out = community_compare(a, b)
    return out.select("n", F.round("nmi", 6).alias("nmi"),
                      F.round("ari", 6).alias("ari"))


_COMMUNITY_COMPARE_SQL = f"""
    WITH {_EDGES_CTE}, {_NODES_CTE},
    la AS (SELECT id, id % 5 AS ca FROM nodes),
    lb AS (SELECT id, id % 3 AS cb FROM nodes),
    ct AS MATERIALIZED (SELECT ca, cb, count(*) AS nij
                        FROM la JOIN lb USING (id) GROUP BY 1, 2),
    ma AS MATERIALIZED (SELECT ca, sum(nij) AS ai FROM ct GROUP BY 1),
    mb AS MATERIALIZED (SELECT cb, sum(nij) AS bj FROM ct GROUP BY 1),
    s AS (SELECT CAST(sum(nij) AS DOUBLE) AS n,
                 sum(CAST(nij AS DOUBLE) * (CAST(nij AS DOUBLE) - 1.0)
                     / 2.0) AS snij2
          FROM ct),
    sa AS (SELECT sum(CAST(ai AS DOUBLE) * (CAST(ai AS DOUBLE) - 1.0)
                      / 2.0) AS sai2 FROM ma),
    sb AS (SELECT sum(CAST(bj AS DOUBLE) * (CAST(bj AS DOUBLE) - 1.0)
                      / 2.0) AS sbj2 FROM mb),
    mi AS (SELECT sum((ct.nij / s.n)
                      * ln((s.n * ct.nij)
                           / (CAST(ma.ai AS DOUBLE) * mb.bj))) AS mi
           FROM ct JOIN ma USING (ca) JOIN mb USING (cb) CROSS JOIN s),
    ha AS (SELECT -sum((ai / s.n) * ln(ai / s.n)) AS ha
           FROM ma CROSS JOIN s),
    hb AS (SELECT -sum((bj / s.n) * ln(bj / s.n)) AS hb
           FROM mb CROSS JOIN s)
    SELECT CAST(s.n AS BIGINT) AS n,
           round(CASE WHEN ha.ha + hb.hb = 0.0 THEN 1.0
                 ELSE 2.0 * mi.mi / (ha.ha + hb.hb) END, 6) + 0.0 AS nmi,
           round(CASE WHEN (sa.sai2 + sb.sbj2) / 2.0
                      - sa.sai2 * sb.sbj2 / (s.n * (s.n - 1.0) / 2.0) = 0.0
                 THEN 1.0
                 ELSE (s.snij2
                       - sa.sai2 * sb.sbj2 / (s.n * (s.n - 1.0) / 2.0))
                      / ((sa.sai2 + sb.sbj2) / 2.0
                         - sa.sai2 * sb.sbj2 / (s.n * (s.n - 1.0) / 2.0))
                 END, 6) + 0.0 AS ari
    FROM s CROSS JOIN sa CROSS JOIN sb
    CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb
"""


def _q_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clauset-Shalizi-Newman continuous-MLE power-law exponent of the
    in-degree distribution (operators/graphstats.py:powerlaw_fit). The
    ln sum runs over the degree HISTOGRAM (one term per distinct
    degree), so both engines sum the same bounded term set."""
    from neo4j_graph_algorithms_spark.operators.graphstats import powerlaw_fit

    out = powerlaw_fit(_edges(spark, sf_dir), direction="in", d_min=2)
    return out.select(F.round("alpha", 6).alias("alpha"), "d_min", "n_tail")


_POWERLAW_SQL = f"""
    WITH {_EDGES_CTE},
    deg AS (SELECT dst, count(*) AS deg FROM edges GROUP BY dst),
    hist AS (SELECT deg, count(*) AS c FROM deg GROUP BY deg),
    tail AS (SELECT * FROM hist WHERE deg >= 2)
    SELECT round(1.0 + CAST(sum(c) AS DOUBLE)
                 / sum(c * ln(deg / 1.5)), 6) AS alpha,
           CAST(2 AS BIGINT) AS d_min,
           CAST(sum(c) AS BIGINT) AS n_tail
    FROM tail
"""


def _q_diameter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact diameter lower bound of the undirected graph by BFS double
    sweep (operators/graphstats.py:diameter_double_sweep); oracle = two
    chained recursive-CTE BFS walks with the same farthest-vertex
    tie-break (max distance, then min id)."""
    from neo4j_graph_algorithms_spark.operators.graphstats import (
        diameter_double_sweep,
    )

    e = _edges(spark, sf_dir)
    return diameter_double_sweep(_vertices(e), e)


_DIAMETER_SWEEP_SQL = f"""
    WITH RECURSIVE {_EDGES_CTE},
    {_NODES_CTE},
    sym AS MATERIALIZED (SELECT DISTINCT u, v FROM (
        SELECT src AS u, dst AS v FROM edges WHERE src <> dst
        UNION ALL SELECT dst, src FROM edges WHERE src <> dst)),
    st AS (SELECT min(id) AS s FROM nodes),
    r1(id, d) AS (
        SELECT s, CAST(0 AS BIGINT) FROM st
        UNION
        SELECT e.v, r1.d + 1 FROM r1 JOIN sym e ON e.u = r1.id
        WHERE r1.d < 64),
    m1 AS (SELECT id, min(d) AS d FROM r1 GROUP BY id),
    far AS (SELECT id FROM m1 ORDER BY d DESC, id LIMIT 1),
    r2(id, d) AS (
        SELECT id, CAST(0 AS BIGINT) FROM far
        UNION
        SELECT e.v, r2.d + 1 FROM r2 JOIN sym e ON e.u = r2.id
        WHERE r2.d < 64),
    m2 AS (SELECT id, min(d) AS d FROM r2 GROUP BY id)
    SELECT (SELECT s FROM st) AS start_id,
           (SELECT id FROM far) AS peripheral_id,
           (SELECT max(d) FROM m2) AS lower_bound
"""


def _q_graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-graph reciprocity + degree assortativity, aggregation-only
    (operators/graphstats.py:graph_summary)."""
    from neo4j_graph_algorithms_spark.operators.graphstats import (
        graph_summary,
    )

    out = graph_summary(_edges(spark, sf_dir))
    return out.select(
        "n_nodes", "n_edges",
        F.round("reciprocity", 6).alias("reciprocity"),
        F.round("assortativity", 6).alias("assortativity"))


def _q_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed d×d embedding covariance via per-partition Gram
    accumulation (model-sized shuffle; pipeline/pca.py). Oracle
    recomputes the moments independently by explode + self-join.

    The driver query quantizes components to integer-valued doubles
    (round(x·10⁴)) FIRST: every Gram/mean term is then an exact integer
    (|Σ| < 2⁵³), so the moment sums are identical on both engines
    regardless of partition/thread summation order — round(cov, 6) of a
    raw-float sum flipped a boundary cell about once per ~50 full-window
    runs before this. Production calls covariance_matrix on raw floats
    (the pytest path, checked vs numpy at allclose tolerance)."""
    from neo4j_graph_algorithms_spark.pipeline.pca import covariance_matrix

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding",
        F.transform("embedding", lambda x: F.round(x * 10000, 0)),
    )
    out = covariance_matrix(emb)
    return out.select("i", "j", F.round("cov", 6).alias("cov"))


def _q_cosine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.ann import cosine_knn_bruteforce

    return cosine_knn_bruteforce(
        _t(spark, sf_dir, "embeddings"), n_queries=50, k=5
    )


def _q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.pipeline.ann import sign_lsh_buckets

    return sign_lsh_buckets(_t(spark, sf_dir, "embeddings"), n_bits=8)


def _q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, sign-LSH bucketed. Threshold 0.3
    (production default 0.9 — the synthetic embeddings are random, max
    pairwise cosine ≈ 0.51, so 0.8+ would be a vacuous 0-row check)."""
    from neo4j_graph_algorithms_spark.pipeline.ann import embedding_near_dup

    return embedding_near_dup(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, n_bits=8, seed=42
    )


def _q_jaccard_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """algo.similarity.jaccard over category sets: item = src node,
    categories = its out-neighbor set; all pairs u<v<60, cutoff 0.05
    (0.2 yields zero pairs on this graph — a vacuous check)."""
    from neo4j_graph_algorithms_spark.operators.similarity import (
        jaccard_categories,
    )

    e = _edges(spark, sf_dir)
    items = e.filter(F.col("src") < 60).groupBy(F.col("src").alias("item")).agg(
        F.collect_set("dst").alias("categories")
    )
    return jaccard_categories(items, cutoff=0.05).select(
        "item1", "item2", F.round("similarity", 6).alias("similarity")
    )


# The reference's full @Procedure surface — the literal name extraction
# of `grep -rh '@Procedure' /root/reference/algo/src/main/java -A1`
# (same independent derivation tests/test_registry_surface.py pins).
_REFERENCE_SURFACE = [
    "algo.allShortestPaths.stream",
    "algo.articleRank", "algo.articleRank.stream",
    "algo.asPath",
    "algo.balancedTriads", "algo.balancedTriads.stream",
    "algo.betweenness", "algo.betweenness.sampled",
    "algo.betweenness.sampled.stream", "algo.betweenness.stream",
    "algo.bfs.stream",
    "algo.closeness", "algo.closeness.dangalchev",
    "algo.closeness.dangalchev.stream", "algo.closeness.harmonic",
    "algo.closeness.harmonic.stream", "algo.closeness.stream",
    "algo.degree", "algo.degree.stream",
    "algo.dfs.stream",
    "algo.eigenvector", "algo.eigenvector.stream",
    "algo.graph.info", "algo.graph.load", "algo.graph.remove",
    "algo.infoMap", "algo.infoMap.stream",
    "algo.kShortestPaths", "algo.kShortestPaths.stream",
    "algo.labelPropagation", "algo.labelPropagation.stream",
    "algo.list",
    "algo.louvain", "algo.louvain.stream",
    "algo.mst",
    "algo.pageRank", "algo.pageRank.stream",
    "algo.randomWalk.stream",
    "algo.scc", "algo.scc.forwardBackward.stream", "algo.scc.iterative",
    "algo.scc.iterative.stream", "algo.scc.multistep",
    "algo.scc.multistep.stream", "algo.scc.recursive.tarjan",
    "algo.scc.recursive.tunedTarjan",
    "algo.scc.recursive.tunedTarjan.stream", "algo.scc.stream",
    "algo.shortestPath", "algo.shortestPath.astar.stream",
    "algo.shortestPath.deltaStepping",
    "algo.shortestPath.deltaStepping.stream", "algo.shortestPath.stream",
    "algo.shortestPaths", "algo.shortestPaths.stream",
    "algo.similarity.cosine", "algo.similarity.cosine.stream",
    "algo.similarity.euclidean", "algo.similarity.euclidean.stream",
    "algo.similarity.jaccard", "algo.similarity.jaccard.stream",
    "algo.similarity.overlap", "algo.similarity.overlap.stream",
    "algo.similarity.pearson", "algo.similarity.pearson.stream",
    "algo.spanningTree", "algo.spanningTree.kmax", "algo.spanningTree.kmin",
    "algo.spanningTree.maximum", "algo.spanningTree.minimum",
    "algo.triangle.stream",
    "algo.triangleCount", "algo.triangleCount.forkJoin",
    "algo.triangleCount.forkJoin.stream", "algo.triangleCount.stream",
    "algo.unionFind", "algo.unionFind.forkJoin",
    "algo.unionFind.forkJoin.stream", "algo.unionFind.forkJoinMerge",
    "algo.unionFind.forkJoinMerge.stream", "algo.unionFind.mscoloring",
    "algo.unionFind.mscoloring.stream", "algo.unionFind.queue",
    "algo.unionFind.queue.stream", "algo.unionFind.stream",
]


def _q_algo_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """algo.list / algo.version driver row (SURVEY §2 #52, previously
    pytest-only): for every procedure of the reference's @Procedure
    surface, the registry must contain it AND its entry point must
    actually import (registry.py:resolve) — a migration-path-total
    claim recorded in the gate artifact. The oracle states the
    contract: every reference procedure resolves. A registry
    regression (missing name, broken import) flips ``resolves`` and
    mismatches."""
    from neo4j_graph_algorithms_spark.registry import (
        list_algorithms,
        resolve,
    )

    reg = list_algorithms()

    def _resolves(p: str) -> bool:
        if p not in reg:
            return False
        try:
            return callable(resolve(p))
        except Exception:
            return False

    rows = [(p, _resolves(p)) for p in _REFERENCE_SURFACE]
    return spark.createDataFrame(rows, "proc string, resolves boolean")


def _algo_list_sql() -> str:
    vals = ", ".join(f"('{p}', true)" for p in _REFERENCE_SURFACE)
    return f"SELECT * FROM (VALUES {vals}) AS t(proc, resolves)"


def _q_graph_catalog_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy projection + filters + named-graph catalog in one driver
    row (SURVEY §2 #5/#9/#14/#53, previously pytest-only): synthetic
    labels (id%3 → Page/Host/Other) and relationship types
    ((src+dst)%2 → LINKS/REDIRECTS) are filtered (label ≠ Other,
    type = LINKS), projected through graph.py:build_graph — whose
    vertex-table semi-joins drop edges with a missing endpoint, the
    VisitRelationship idMap-miss rule — then LOADED into the
    GraphCatalog and loaded AGAIN with empty frames: algo.graph.load
    is idempotent (LoadGraphProc.java:84-88 returns the cached entry),
    so if the second load were honored the output would be empty and
    the row-count would mismatch. Output: out-degrees over the cached
    graph plus the catalog's node/edge counts as columns the oracle
    must reproduce relationally (algo.graph.info)."""
    from neo4j_graph_algorithms_spark.catalog import GraphCatalog
    from neo4j_graph_algorithms_spark.graph import build_graph, degrees

    e0 = _edges(spark, sf_dir)
    v = _vertices(e0).select(
        "id",
        F.when(F.col("id") % 3 == 0, "Page")
        .when(F.col("id") % 3 == 1, "Host")
        .otherwise("Other").alias("label"))
    e = e0.select(
        "src", "dst",
        F.when((F.col("src") + F.col("dst")) % 2 == 0, "LINKS")
        .otherwise("REDIRECTS").alias("rel_type"))
    vf = v.filter(F.col("label") != "Other").select("id")
    ef = e.filter(F.col("rel_type") == "LINKS").select("src", "dst")
    g = build_graph(ef, vf)
    cat = GraphCatalog(spark)
    cat.load("proof_graph", g.vertices, g.edges)
    cat.load("proof_graph", g.vertices.limit(0), g.edges.limit(0))
    gg = cat.get("proof_graph")
    out = degrees(gg.edges, "out").select(
        "id", "degree",
        F.lit(gg.node_count).cast("long").alias("n_nodes"),
        F.lit(gg.edge_count).cast("long").alias("n_edges"))
    cat.remove("proof_graph")
    return out


def _q_similarity_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """algo.similarity.overlap (OverlapProc, |A∩B| / min(|A|,|B|))
    over the same category sets as jaccard_categories; cutoff 0.25
    (overlap dominates jaccard, so the jaccard cutoff would keep
    nearly every pair) — operators/similarity.py:overlap_categories.
    SURVEY §2 #41's first driver row; previously pytest-only."""
    from neo4j_graph_algorithms_spark.operators.similarity import (
        overlap_categories,
    )

    e = _edges(spark, sf_dir)
    items = e.filter(F.col("src") < 60).groupBy(F.col("src").alias("item")).agg(
        F.collect_set("dst").alias("categories")
    )
    return overlap_categories(items, cutoff=0.25).select(
        "item1", "item2", F.round("similarity", 6).alias("similarity")
    )


def _q_relationship_writeback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relationship write-back sink driver row (SURVEY §2 #6/#8,
    previously pytest-only): the jaccard similarity pairs are written
    through sources/iceberg.py:write_similarity_relationships (the
    SimilarityExporter equivalent — one distributed typed-edge write,
    no per-row transactions) and read BACK through read_table; the
    oracle recomputes the pairs relationally, so a sink that drops,
    duplicates, or mistypes rows (or a read path that breaks schema)
    mismatches. Parquet fallback path in-sandbox; identical call shape
    targets Iceberg on a real cluster."""
    import tempfile

    from neo4j_graph_algorithms_spark.operators.similarity import (
        jaccard_categories,
    )
    from neo4j_graph_algorithms_spark.sources.iceberg import (
        read_table,
        write_similarity_relationships,
    )

    e = _edges(spark, sf_dir)
    items = e.filter(F.col("src") < 60).groupBy(F.col("src").alias("item")).agg(
        F.collect_set("dst").alias("categories")
    )
    pairs = jaccard_categories(items, cutoff=0.05)
    path = tempfile.mkdtemp(prefix="nga_relsink_") + "/similar"
    write_similarity_relationships(pairs, path, relationship_type="SIMILAR")
    return read_table(spark, path).select(
        "src", "dst", "rel_type",
        F.round("similarity", 6).alias("similarity"))


def _q_jaccard_degree_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jaccard with degree_cutoff=3 (JaccardProc degreeCutoff config,
    similarity.py:43-45): items with fewer than 3 categories are
    dropped before pairing."""
    from neo4j_graph_algorithms_spark.operators.similarity import (
        jaccard_categories,
    )

    e = _edges(spark, sf_dir)
    items = e.filter(F.col("src") < 60).groupBy(F.col("src").alias("item")).agg(
        F.collect_set("dst").alias("categories")
    )
    return jaccard_categories(items, cutoff=0.05, degree_cutoff=3).select(
        "item1", "item2", F.round("similarity", 6).alias("similarity")
    )


def _q_events_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot dedup (pipeline/dedup.py:keep_latest — the
    Common-Crawl re-crawl rule, exercised here as latest event per
    user): one key-partitioned window rank, deterministic event_id
    tie-break. Oracle is the identical row_number filter."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import keep_latest

    ev = _t(spark, sf_dir, "events")
    return keep_latest(
        ev, ["user_id"], "ts", tiebreak=["event_id"]
    ).select("user_id", "event_id", "event_type",
             F.round("value", 6).alias("value"))


def _q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.floor(F.unix_timestamp("ts") / 300).alias("win"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


def _q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "new_sess",
        (
            F.coalesce(
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)),
                F.lit(10**9),
            )
            > 1800
        ).cast("long"),
    )
    return gaps.groupBy("user_id").agg(F.sum("new_sess").alias("n_sessions"))


def _q_extract_pages_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # engine-native payload: synthetic pages → extracted edge table.
    # Oracle (_pages_edges_sql) recomputes the link list directly from
    # the splitmix64 arithmetic in SQL — independent of html building
    # AND of the regex extraction path being checked here
    from neo4j_graph_algorithms_spark.sources import extract_edges, generate_pages

    pages = generate_pages(spark, 2000)
    return extract_edges(pages)


def _q_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-citation pair mining on the pages link graph: pages cited
    together by ≥2 common sources (operators/cocitation.py). One
    equality self-join on the shared source, hot sources pruned first;
    oracle replays the arithmetic link list."""
    from neo4j_graph_algorithms_spark.operators.cocitation import (
        cocitation_pairs,
    )
    from neo4j_graph_algorithms_spark.sources import (
        extract_edges, generate_pages,
    )

    e = extract_edges(generate_pages(spark, 2000)).select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst"))
    return cocitation_pairs(e, min_count=2)


REWIRE_SEED = 7


def _q_rewire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Configuration-model rewiring (operators/nullmodel.py — Newman's
    degree-preserving null model for motif significance): stubs ranked
    by a seeded md5 order via distributed prefix sums, re-paired by
    global position. Oracle replays the identical md5 ordering with
    SQL row_number."""
    from neo4j_graph_algorithms_spark.operators.nullmodel import (
        rewire_configuration_model,
    )

    e = _edges(spark, sf_dir)
    return rewire_configuration_model(e, seed=REWIRE_SEED)


def _rewire_sql(seed: int) -> str:
    def key(role: str) -> str:
        return (
            f"md5(concat_ws('|', '{seed}', '{role}', "
            "CAST(src AS VARCHAR), CAST(dst AS VARCHAR))) || '-' || "
            "lpad(CAST(src AS VARCHAR), 12, '0') || "
            "lpad(CAST(dst AS VARCHAR), 12, '0')"
        )
    return f"""
        WITH {_EDGES_CTE},
        o AS (SELECT src, {key('out')} AS k FROM edges),
        outs AS (SELECT src, row_number() OVER (ORDER BY k) AS r FROM o),
        i AS (SELECT dst, {key('in')} AS k FROM edges),
        ins AS (SELECT dst, row_number() OVER (ORDER BY k) AS r FROM i)
        SELECT outs.src, ins.dst FROM outs JOIN ins ON outs.r = ins.r
    """


def _q_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global butterfly (2x2 biclique) count of the pages link graph
    (operators/cocitation.py:butterfly_count — Sanei-Mehri et al.
    KDD'18): one C(n,2) fold over the coupling wedge join."""
    from neo4j_graph_algorithms_spark.operators.cocitation import (
        butterfly_count,
    )
    from neo4j_graph_algorithms_spark.sources import (
        extract_edges, generate_pages,
    )

    e = extract_edges(generate_pages(spark, 2000)).select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst"))
    return butterfly_count(e)


def _butterflies_sql(n: int) -> str:
    return (
        "WITH " + ",\n".join(_pages_linklist_parts(n)) + ",\n"
        "e AS (SELECT DISTINCT src_url, dst_url FROM plinks),\n"
        "cp AS (SELECT a.src_url AS item_a, b.src_url AS item_b, "
        "count(*) AS n_common "
        "FROM e a JOIN e b ON a.dst_url = b.dst_url "
        "AND a.src_url < b.src_url "
        "GROUP BY 1, 2 HAVING count(*) >= 2)\n"
        "SELECT CAST(coalesce(sum(n_common * (n_common - 1) / 2), 0.0) "
        "AS BIGINT) AS butterflies, count(*) AS wedge_pairs FROM cp"
    )


def _q_coupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bibliographic coupling (the transpose of co-citation: pages
    LINKING TO ≥2 common targets; Kessler 1963) on the same pages
    link graph — pivot is the shared target."""
    from neo4j_graph_algorithms_spark.operators.cocitation import (
        coupling_pairs,
    )
    from neo4j_graph_algorithms_spark.sources import (
        extract_edges, generate_pages,
    )

    e = extract_edges(generate_pages(spark, 2000)).select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst"))
    return coupling_pairs(e, min_count=2)


def _coupling_sql(n: int, min_count: int = 2) -> str:
    """Coupling oracle: the cocitation SQL with the pivot transposed
    (shared dst_url, paired src_urls)."""
    return (
        "WITH " + ",\n".join(_pages_linklist_parts(n)) + ",\n"
        "e AS (SELECT DISTINCT src_url, dst_url FROM plinks)\n"
        "SELECT a.src_url AS item_a, b.src_url AS item_b, "
        "count(*) AS n_common "
        "FROM e a JOIN e b ON a.dst_url = b.dst_url "
        "AND a.src_url < b.src_url "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_count}"
    )


def _cocitation_sql(n: int, min_count: int = 2) -> str:
    """Oracle for cocitation: distinct link list → source-pivot
    self-join → pair counts (operators/cocitation.py:cocitation_pairs;
    the driver graph's max out-degree is far under the 1000 cutoff, so
    the prune keeps everything — pinned non-vacuously in pytest)."""
    return (
        "WITH " + ",\n".join(_pages_linklist_parts(n)) + ",\n"
        "e AS (SELECT DISTINCT src_url, dst_url FROM plinks)\n"
        "SELECT a.dst_url AS item_a, b.dst_url AS item_b, "
        "count(*) AS n_common "
        "FROM e a JOIN e b ON a.src_url = b.src_url "
        "AND a.dst_url < b.dst_url "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_count}"
    )


def _q_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-truss peel state after 3 fixed rounds (operators/ktruss.py):
    surviving canonical edges where every edge closes ≥3 triangles.
    Fixed rounds keep the peel deterministic-depth, so the oracle
    unrolls it round by round (the k_core oracle pattern)."""
    from neo4j_graph_algorithms_spark.operators.ktruss import k_truss

    return k_truss(_edges(spark, sf_dir), 5, max_rounds=3).edges


def _ktruss_unrolled_sql(k: int, rounds: int) -> str:
    """Unrolled k-truss peel: per round a triangle enumeration on the
    surviving canonical edge set, a 3-role support count, and the
    support < k−2 edge drop — mirrors operators/ktruss.py:k_truss.
    MATERIALIZED: each e{{i}} is referenced three times by the wedge
    join and tri{{i}} three times by the role union."""
    parts = [
        _EDGES_CTE,
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM edges WHERE src <> dst)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"tri{i} AS MATERIALIZED (SELECT x.a AS p, x.b AS q, y.b AS r "
            f"FROM e{i-1} x JOIN e{i-1} y ON x.a = y.a AND x.b < y.b "
            f"JOIN e{i-1} z ON z.a = x.b AND z.b = y.b)"
        )
        parts.append(
            f"sup{i} AS MATERIALIZED (SELECT a, b, count(*) AS s FROM ("
            f"SELECT p AS a, q AS b FROM tri{i} UNION ALL "
            f"SELECT p, r FROM tri{i} UNION ALL "
            f"SELECT q, r FROM tri{i}) GROUP BY a, b)"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT e.a, e.b FROM e{i-1} e "
            f"LEFT JOIN sup{i} s ON e.a = s.a AND e.b = s.b "
            f"WHERE coalesce(s.s, 0) >= {k - 2})"
        )
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT a, b FROM e{rounds}")


def _q_densest_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bahmani et al. (1+ε)-greedy densest-subgraph peel, ε=0.5, 8
    bounded rounds (operators/densest.py): vertices of the densest
    intermediate subgraph plus its density. Deterministic depth → the
    oracle unrolls the peel and replays the argmax round."""
    from neo4j_graph_algorithms_spark.operators.densest import (
        densest_subgraph,
    )

    e = _edges(spark, sf_dir)
    return densest_subgraph(_vertices(e), e, epsilon=0.5,
                            max_rounds=8).members


def _densest_unrolled_sql(rounds: int, eps: float = 0.5) -> str:
    """Unrolled (1+ε) densest-subgraph peel — mirrors
    operators/densest.py:densest_subgraph: per round the surviving
    canonical edge count, density, degree aggregation, and the
    deg > 2(1+ε)ρ filter; the answer is the alive set of the max-ρ
    round (ties → earliest). Division only evaluates on surviving rows,
    so an emptied alive set short-circuits safely."""
    parts = [
        _EDGES_CTE, _NODES_CTE,
        "ce AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM edges WHERE src <> dst)",
        "al0 AS MATERIALIZED (SELECT id FROM nodes)",
    ]
    for i in range(rounds):
        parts.append(
            f"sv{i} AS MATERIALIZED (SELECT ce.a, ce.b FROM ce "
            f"JOIN al{i} x ON ce.a = x.id JOIN al{i} y ON ce.b = y.id)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT {i} AS r, "
            f"(SELECT count(*) FROM sv{i}) AS m, "
            f"(SELECT count(*) FROM al{i}) AS n)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT id, count(*) AS deg FROM ("
            f"SELECT a AS id FROM sv{i} UNION ALL "
            f"SELECT b FROM sv{i}) GROUP BY id)"
        )
        parts.append(
            f"al{i+1} AS MATERIALIZED (SELECT v.id FROM al{i} v "
            f"LEFT JOIN d{i} d ON v.id = d.id, s{i} "
            f"WHERE s{i}.n > 0 AND coalesce(d.deg, 0) > "
            f"2 * (1 + {eps!r}) * (CAST(s{i}.m AS DOUBLE) / s{i}.n))"
        )
    summ_union = " UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(rounds))
    alive_union = " UNION ALL ".join(
        f"SELECT {i} AS r, id FROM al{i}" for i in range(rounds))
    parts.append(
        f"summ AS (SELECT r, CAST(m AS DOUBLE) / n AS rho "
        f"FROM ({summ_union}) WHERE n > 0)")
    parts.append(
        "best AS (SELECT r, rho FROM summ ORDER BY rho DESC, r ASC "
        "LIMIT 1)")
    parts.append(f"ar AS ({alive_union})")
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT ar.id, round((SELECT rho FROM best), 6) AS density "
        "FROM ar WHERE ar.r = (SELECT r FROM best)"
    )


def _q_anchor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incoming anchor-text rollup per target page — the Common-Crawl
    signal aggregated alongside the link graph. Checks the FULL anchor
    path: html generation → regex (href, text) extraction → two-level
    partial aggregation with a struct-min top pick
    (sources/extraction.py:anchor_stats); the oracle recomputes every
    pair from the splitmix64 link arithmetic, independent of html."""
    from neo4j_graph_algorithms_spark.sources import anchor_stats, generate_pages

    pages = generate_pages(spark, 2000)
    return anchor_stats(pages)


def _q_pages_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # flagship end-to-end: pages → extraction → id-map → PageRank,
    # oracle-checked the whole way (_pages_pagerank_sql: SQL link list →
    # row_number id map → tolerance-unrolled PageRank)
    from neo4j_graph_algorithms_spark.sources import extract_edges, generate_pages
    from neo4j_graph_algorithms_spark.graph import id_map

    pages = generate_pages(spark, 2000)
    raw = extract_edges(pages).persist()
    raw.count()  # id_map + the joins below reuse the extraction
    ids = id_map(
        raw.select(F.col("src_url").alias("src"), F.col("dst_url").alias("dst")),
        node_col="url",
    )
    e = (
        raw.join(ids.withColumnRenamed("url", "src_url"), "src_url")
        .withColumnRenamed("id", "src")
        .join(ids.withColumnRenamed("url", "dst_url"), "dst_url")
        .withColumnRenamed("id", "dst")
        .select("src", "dst")
    )
    v = ids.select("id")
    res = pagerank(v, e, max_iterations=50, tol=1e-6)
    out = res.ranks.select("id", F.round("rank", 6).alias("rank")) \
        .localCheckpoint(eager=True)
    raw.unpersist()
    return out


_HOST_N_PAGES = 2000
_HOST_N_HOSTS = 64
_HOST_PR_ITERS = 20


def _host_edges(spark: SparkSession) -> DataFrame:
    """pages (multi-host) → extracted distinct page edges → host rollup
    (weight = distinct page links between the hosts, self-host edges
    dropped) — the Common-Crawl-style host graph."""
    from neo4j_graph_algorithms_spark.operators.hostgraph import host_graph
    from neo4j_graph_algorithms_spark.sources import (
        extract_edges, generate_pages,
    )

    pages = generate_pages(spark, _HOST_N_PAGES, n_hosts=_HOST_N_HOSTS)
    return host_graph(extract_edges(pages, dedup=True),
                      drop_self_loops=True)


def _q_pages_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _host_edges(spark).select("src_host", "dst_host", "weight")


def _q_pages_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end host ranking: pages → page edges → host rollup →
    weighted PageRank on the host graph → (host, rank)."""
    from neo4j_graph_algorithms_spark.graph import id_map

    he = _host_edges(spark).persist()
    he.count()
    ids = id_map(
        he.select(F.col("src_host").alias("src"),
                  F.col("dst_host").alias("dst")),
        node_col="host",
    ).persist()
    e = (
        he.join(ids.withColumnRenamed("host", "src_host"), "src_host")
        .withColumnRenamed("id", "src")
        .join(ids.withColumnRenamed("host", "dst_host"), "dst_host")
        .withColumnRenamed("id", "dst")
        .select("src", "dst", F.col("weight").cast("double").alias("weight"))
    )
    res = pagerank(ids.select("id"), e, max_iterations=_HOST_PR_ITERS,
                   tol=0.0, weighted=True)
    out = (
        res.ranks.join(ids, "id")
        .select("host", F.round("rank", 6).alias("rank"))
        .localCheckpoint(eager=True)
    )
    he.unpersist()
    ids.unpersist()
    return out


OPIC_STEPS = 8


def _q_opic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC crawl importance (Abiteboul et al. WWW'03,
    operators/opic.py): synchronous cash/history supersteps with the
    virtual-page dangling feed. Fixed supersteps at the same graph as
    pagerank; oracle unrolls the recurrence including the per-step
    dangling-mass scalar."""
    from neo4j_graph_algorithms_spark.operators.opic import opic_importance

    e = _edges(spark, sf_dir)
    out = opic_importance(_vertices(e), e, supersteps=OPIC_STEPS)
    return out.select("id", F.round("importance", 6).alias("importance"))


def _opic_unrolled_sql(steps: int) -> str:
    """Chained-CTE replay of the synchronous OPIC recurrence
    (cash/history + uniform dangling redistribution each step)."""
    parts = [
        _EDGES_CTE, _NODES_CTE,
        "deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src)",
        ("fac AS (SELECT e.src, e.dst, 1.0 / d.outd AS factor "
         "FROM edges e JOIN deg d ON e.src = d.src)"),
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        ("dang AS (SELECT n.id FROM nodes n LEFT JOIN deg d "
         "ON d.src = n.id WHERE d.src IS NULL)"),
        # MATERIALIZED: each state CTE is referenced 3× (dangling scalar,
        # message join, carry-over) — DuckDB inlines by default, which
        # would make the unroll exponential in `steps`
        ("s0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS cash, "
         "CAST(0 AS DOUBLE) AS hist FROM nodes)"),
    ]
    for i in range(1, steps + 1):
        parts.append(
            f"d{i} AS (SELECT coalesce(sum(s.cash), 0.0) AS dm "
            f"FROM s{i-1} s JOIN dang ON dang.id = s.id)"
        )
        parts.append(
            f"m{i} AS (SELECT f.dst AS id, sum(s.cash * f.factor) AS msg "
            f"FROM fac f JOIN s{i-1} s ON f.src = s.id GROUP BY f.dst)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT s.id, "
            f"coalesce(m.msg, 0.0) + (SELECT dm FROM d{i}) / "
            f"(SELECT n FROM nn) AS cash, "
            f"s.hist + s.cash AS hist "
            f"FROM s{i-1} s LEFT JOIN m{i} m ON m.id = s.id)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, round((hist + cash) / {steps + 1}.0, 6) "
        f"AS importance FROM s{steps}"
    )


def _q_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder bow-tie decomposition (operators/bowtie.py) on the same
    300-node induced subgraph as the SCC row; oracle recomputes CORE
    via the transitive-closure SCC, IN/OUT via closure reach, and the
    giant weak component via the symmetric closure."""
    from neo4j_graph_algorithms_spark.operators.bowtie import (
        bowtie_decomposition,
    )

    e = _sub_edges(spark, sf_dir, 300)
    return bowtie_decomposition(_vertices(e), e)


def _bowtie_sql(n: int) -> str:
    return f"""
    WITH RECURSIVE {_sub_cte(n)}, {_SNODES_CTE},
    r(u, v) AS (
      SELECT src, dst FROM sub WHERE src <> dst
      UNION
      SELECT r.u, e.dst FROM r JOIN sub e ON e.src = r.v WHERE e.dst <> r.u
    ),
    mut AS (SELECT a.u AS id, a.v AS o FROM r a
            JOIN r b ON b.u = a.v AND b.v = a.u),
    allm AS (SELECT id, o FROM mut
             UNION ALL SELECT id, id FROM snodes),
    comp AS (SELECT id, min(o) AS component FROM allm GROUP BY id),
    topc AS (SELECT component FROM comp GROUP BY component
             ORDER BY count(*) DESC, component ASC LIMIT 1),
    core AS (SELECT id FROM comp
             WHERE component = (SELECT component FROM topc)),
    fwd AS (SELECT DISTINCT r.v AS id FROM r JOIN core c ON r.u = c.id),
    bwd AS (SELECT DISTINCT r.u AS id FROM r JOIN core c ON r.v = c.id),
    sym AS (SELECT src, dst FROM sub WHERE src <> dst
            UNION SELECT dst, src FROM sub WHERE src <> dst),
    ur(u, v) AS (
      SELECT src, dst FROM sym
      UNION
      SELECT ur.u, e.dst FROM ur JOIN sym e ON e.src = ur.v
      WHERE e.dst <> ur.u
    ),
    wall AS (SELECT u AS id, v AS o FROM ur
             UNION ALL SELECT id, id FROM snodes),
    wcomp AS (SELECT id, min(o) AS wc FROM wall GROUP BY id),
    giant AS (SELECT min(w.wc) AS wc FROM wcomp w JOIN core c ON w.id = c.id)
    SELECT n.id,
      CASE WHEN c.id IS NOT NULL THEN 'CORE'
           WHEN b.id IS NOT NULL THEN 'IN'
           WHEN f.id IS NOT NULL THEN 'OUT'
           WHEN w.wc = (SELECT wc FROM giant) THEN 'TENDRILS'
           ELSE 'DISCONNECTED' END AS bowtie_class
    FROM snodes n
    LEFT JOIN core c ON c.id = n.id
    LEFT JOIN bwd b ON b.id = n.id
    LEFT JOIN fwd f ON f.id = n.id
    JOIN wcomp w ON w.id = n.id
    """


# ---------------------------------------------------------------------------
# URL canonicalization family (pipeline/urlnorm.py)
# ---------------------------------------------------------------------------

def _synth_url_variants():
    """Deterministic messy-URL spelling per doc_id (6 variant classes:
    upper-case scheme/host + trailing slash, explicit default port,
    fragment, tracking params, permuted query, non-default port /
    empty path). Mirrored literally in _CANON_SYNTH_SQL."""
    i = F.col("doc_id")
    h = (i % 7).cast("string")
    s = i.cast("string")
    v = i % 6
    pre = lambda scheme, port="": F.concat(  # noqa: E731
        F.lit(f"{scheme}://h"), h, F.lit(f".example.org{port}/p/"), s)
    return (
        F.when(v == 0, F.concat(F.lit("HTTPS://H"), h,
                                F.lit(".Example.ORG/p/"), s, F.lit("/")))
        .when(v == 1, F.concat(pre("https", ":443"),
                               F.lit("?utm_source=x&b=2&a=1")))
        .when(v == 2, F.concat(pre("http", ":80"), F.lit("#frag-"), s))
        .when(v == 3, F.concat(pre("https"), F.lit("?z=9&gclid=abc&a=1&a=0")))
        .when(v == 4, F.concat(F.lit("https://h"), h, F.lit(".example.org")))
        .otherwise(F.concat(F.lit("https://h"), h,
                            F.lit(".example.org:8443/p/"), s))
    )


_CANON_SYNTH_SQL = """
    CASE CAST(doc_id % 6 AS INT)
      WHEN 0 THEN 'HTTPS://H' || CAST(doc_id % 7 AS VARCHAR)
        || '.Example.ORG/p/' || CAST(doc_id AS VARCHAR) || '/'
      WHEN 1 THEN 'https://h' || CAST(doc_id % 7 AS VARCHAR)
        || '.example.org:443/p/' || CAST(doc_id AS VARCHAR)
        || '?utm_source=x&b=2&a=1'
      WHEN 2 THEN 'http://h' || CAST(doc_id % 7 AS VARCHAR)
        || '.example.org:80/p/' || CAST(doc_id AS VARCHAR)
        || '#frag-' || CAST(doc_id AS VARCHAR)
      WHEN 3 THEN 'https://h' || CAST(doc_id % 7 AS VARCHAR)
        || '.example.org/p/' || CAST(doc_id AS VARCHAR)
        || '?z=9&gclid=abc&a=1&a=0'
      WHEN 4 THEN 'https://h' || CAST(doc_id % 7 AS VARCHAR)
        || '.example.org'
      ELSE 'https://h' || CAST(doc_id % 7 AS VARCHAR)
        || '.example.org:8443/p/' || CAST(doc_id AS VARCHAR)
    END
"""


def _canon_url_cte_parts(keep: str) -> list[str]:
    """CTEs ``cp``/``cq`` canonicalizing column ``url`` of CTE ``u`` —
    the DuckDB replay of pipeline/urlnorm.py:canonicalize_url (same
    regexes, same tracking-param rule, same trailing-slash/default-port
    handling). ``keep`` = comma-joined passthrough columns of ``u``.
    Final canonical expression available as cq.canon."""
    track = r"^(utm_[^=&]*|gclid|fbclid|ref)(=|$)"
    return [
        f"""cp AS (SELECT {keep}, url,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
            AS scheme,
          lower(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)) AS host,
          coalesce(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)', 1), '')
            AS port,
          coalesce(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '')
            AS rawpath,
          -- DuckDB regexp_extract is NULL (not '') on no match — Spark
          -- returns ''; coalesce keeps the twin expressions aligned
          coalesce(regexp_extract(url, '^[^#]*?\\?([^#]*)', 1), '') AS qraw
          FROM u)""",
        f"""cq AS (SELECT {keep}, url, scheme, host,
          CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
                    AND NOT (scheme = 'https' AND port = '443')
               THEN ':' || port ELSE '' END AS port_part,
          CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
               ELSE regexp_replace(rawpath, '/+$', '') END AS path_part,
          -- array_to_string over an empty list is NULL in DuckDB;
          -- Spark's array_join gives '' — coalesce aligns the twins
          coalesce(array_to_string(list_sort(list_filter(
            string_split(qraw, '&'),
            x -> x <> '' AND NOT regexp_matches(x, '{track}'))), '&'), '')
            AS qstr
          FROM cp)""",
        f"""canon AS (SELECT {keep}, url,
          CASE WHEN scheme = '' THEN url
               ELSE scheme || '://' || host || port_part || path_part ||
                 CASE WHEN qstr = '' THEN '' ELSE '?' || qstr END
          END AS canonical_url FROM cq)""",
    ]


def _q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch frequency table over document tokens
    (pipeline/cms.py): build the 4×1024 counter table, then estimate
    the 20 true-most-frequent tokens through it — (tok, true_cnt,
    est_cnt), CMS guarantee est ≥ true. Every counter is an exact
    integer, so the DuckDB oracle replays the sketch bit-for-bit."""
    from neo4j_graph_algorithms_spark.pipeline.cms import (
        cms_build,
        cms_estimate,
    )
    from neo4j_graph_algorithms_spark.pipeline.dedup import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens_expr(F.col("text"))).alias("tok"))
    cms = cms_build(toks, "tok", depth=4, width=1024)
    top = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("tok")).limit(20)
    )
    return cms_estimate(cms, top, "tok", depth=4, width=1024)


def _cms_heavy_hitters_sql(depth: int = 4, width: int = 1024) -> str:
    def idx(d: int) -> str:
        return (f"CAST(('0x' || substr(md5(tok || '#cms{d}'), 1, 8)) "
                f"AS BIGINT) % {width}")

    cms_parts = " UNION ALL ".join(
        f"SELECT {d} AS d, {idx(d)} AS idx, count(*) AS cnt "
        f"FROM toks GROUP BY idx" for d in range(depth))
    probe_parts = " UNION ALL ".join(
        f"SELECT tok, true_cnt, {d} AS d, {idx(d)} AS idx FROM top"
        for d in range(depth))
    return f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '),
                                x -> x <> '')) AS tok
      FROM documents),
    top AS (
      SELECT tok, count(*) AS true_cnt FROM toks GROUP BY tok
      ORDER BY true_cnt DESC, tok LIMIT 20),
    cms AS ({cms_parts}),
    probes AS ({probe_parts})
    SELECT p.tok, p.true_cnt,
           min(coalesce(c.cnt, 0)) AS est_cnt
    FROM probes p LEFT JOIN cms c ON c.d = p.d AND c.idx = p.idx
    GROUP BY p.tok, p.true_cnt
    """


def _q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: linear classifier inference over
    hashed bag-of-words features, map-only (pipeline/classifier.py).
    Deterministic pseudo-weights (integer multiply-add-mod of the
    md5-hashed feature index); the margin numerator is an exact
    integer sum so the oracle compare is addition-order-free, the
    sigmoid input is one division of exact integers, and keep is a
    pure integer decision."""
    from neo4j_graph_algorithms_spark.pipeline.classifier import (
        quality_classifier_score,
    )

    return quality_classifier_score(_t(spark, sf_dir, "documents"))


def _quality_classifier_sql(n_features: int = 1 << 18,
                            wscale: int = 1 << 20) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ts
      FROM documents),
    feat AS (
      SELECT doc_id, len(ts) AS n,
        CASE WHEN len(ts) = 0 THEN CAST(0 AS BIGINT) ELSE CAST(
          list_sum(list_transform(ts, t ->
            ((((CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)
                % {n_features}) * 2654435761 + 1013904223)
              % {2 * wscale}) - {wscale}))) AS BIGINT)
        END AS margin_num
      FROM toks)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, margin_num,
           round(1.0 / (1.0 + exp(-(CASE WHEN n = 0 THEN 0.0
                 ELSE CAST(margin_num AS DOUBLE) / (n * {wscale}.0)
                 END))), 9) AS score,
           margin_num >= 0 AS keep
    FROM feat
    """


def _q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source driver row (VERDICT r3 next-round #10): synthesize a
    deterministic gzipped WARC segment from the first 100 documents
    (ISO 28500 response records wrapping an HTTP/1.1 message whose body
    is the document text in a fixed html shell), parse it back through
    sources/warc.py:read_warc (binaryFile scan → mapInPandas Arrow
    parse), and emit per-record (url, epoch ts, status, content-type,
    body md5/length). The oracle reconstructs every field relationally
    from the same documents rows — a parse that drops, truncates, or
    corrupts any record mismatches."""
    import gzip
    import os
    import tempfile

    from neo4j_graph_algorithms_spark.sources.warc import read_warc

    docs = (
        _t(spark, sf_dir, "documents").select("doc_id", "text")
        .filter(F.col("doc_id") < 100).orderBy("doc_id").collect()
    )  # bounded fixture — 100 rows by construction
    parts = []
    for r in docs:
        body = f"<html><body>{r['text']}</body></html>".encode("utf-8")
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: http://fixture.test/{r['doc_id']}\r\n"
            f"WARC-Date: 2024-01-01T00:00:{r['doc_id'] % 60:02d}Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        parts.append(head + http + b"\r\n\r\n")
    d = tempfile.mkdtemp(prefix="warc_fixture_")
    with open(os.path.join(d, "seg-00000.warc.gz"), "wb") as fh:
        fh.write(gzip.compress(b"".join(parts)))
    return read_warc(spark, d).select(
        "url",
        F.col("warc_ts").cast("long").alias("ts_epoch"),
        "http_status",
        "content_type",
        F.md5(F.col("html")).alias("body_md5"),
        # octet_length (bytes), NOT length (chars): the oracle measures
        # UTF-8 bytes, and the two only coincide on ASCII fixtures.
        F.octet_length(F.col("html")).cast("long").alias("body_len"),
    )


_WARC_ROUNDTRIP_SQL = """
    SELECT 'http://fixture.test/' || CAST(doc_id AS VARCHAR) AS url,
           1704067200 + doc_id % 60 AS ts_epoch,
           200 AS http_status,
           'text/html' AS content_type,
           md5('<html><body>' || text || '</body></html>') AS body_md5,
           CAST(octet_length(encode(
                '<html><body>' || text || '</body></html>'))
                AS BIGINT) AS body_len
    FROM documents WHERE doc_id < 100
"""


def _q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal image driver row (warc_roundtrip recipe): synthesize
    a deterministic binary-PPM (P6) payload per doc_id < 80 — w = 4 +
    id%5, h = 3 + id%4, raw byte j = (id·31 + j) % 256 — decode it for
    REAL through pipeline/multimodal.py:extract_image_features
    (mapInPandas Arrow kernel → pure-numpy P6 parser → 16-bin Rec.601
    integer-luminance histogram) and emit the histogram DE-normalized
    back to exact integer pixel counts (cnt = round(f·w·h); the
    float32 representation error of c/(w·h) is ≪ 0.5 at w·h ≤ 48, so
    the roundtrip is exact). The oracle rebuilds every count
    relationally from the same byte formula — a decode that misreads
    the header, channel order, or stride mismatches. Zero-count bins
    are filtered on the Spark side to match the oracle's group-by."""
    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        extract_image_features,
    )

    ids = [r[0] for r in _t(spark, sf_dir, "documents")
           .select("doc_id").filter(F.col("doc_id") < 80)
           .orderBy("doc_id").collect()]  # bounded fixture — ≤80 rows
    rows = []
    for i in ids:
        w, h = 4 + i % 5, 3 + i % 4
        body = bytes((i * 31 + j) % 256 for j in range(3 * w * h))
        rows.append((i, bytearray(f"P6\n{w} {h}\n255\n".encode() + body)))
    payloads = spark.createDataFrame(rows, "item_id long, payload binary")
    feats = extract_image_features(payloads)
    return (
        feats.select(
            "item_id", "n_bytes", "width", "height",
            F.posexplode("features").alias("bin", "_f"))
        .select(
            "item_id", "n_bytes", "width", "height",
            F.col("bin").cast("int").alias("bin"),
            F.round(F.col("_f").cast("double")
                    * F.col("width") * F.col("height"))
            .cast("long").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )


_IMAGE_FEATURES_SQL = """
    WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
               FROM documents WHERE doc_id < 80),
    px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM d),
    lum AS (SELECT doc_id, w, h,
              (((doc_id * 31 + 3 * i) % 256) * 299
             + ((doc_id * 31 + 3 * i + 1) % 256) * 587
             + ((doc_id * 31 + 3 * i + 2) % 256) * 114) // 1000 AS l
            FROM px)
    SELECT doc_id AS item_id,
           CAST(11 + 3 * w * h AS BIGINT) AS n_bytes,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(l // 16 AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lum GROUP BY doc_id, w, h, l // 16
"""


def _q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio driver row: synthesize a deterministic 16-bit
    PCM mono WAV per doc_id < 80 (stdlib ``wave`` writer; rate 8000,
    n = 200 + id%100 frames, sample s_j = (id·7919 + j·104729) % 65536
    − 32768), decode it for REAL through pipeline/multimodal.py:
    extract_audio_features (mapInPandas → stdlib wave parser), and
    emit integer-exact fields: n_bytes (44-byte canonical header +
    2n), channel/rate/frame counts, duration and RMS in micro-units
    (round(x·1e6) — the Σs² under the RMS is an exact integer < 2^53,
    so both engines sqrt/divide identical doubles), plus the 16-bin
    |amplitude|>>11 histogram de-normalized to exact counts."""
    import io
    import wave

    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        extract_audio_features,
    )

    ids = [r[0] for r in _t(spark, sf_dir, "documents")
           .select("doc_id").filter(F.col("doc_id") < 80)
           .orderBy("doc_id").collect()]  # bounded fixture — ≤80 rows
    rows = []
    for i in ids:
        n = 200 + i % 100
        pcm = b"".join(
            int((i * 7919 + j * 104729) % 65536 - 32768)
            .to_bytes(2, "little", signed=True) for j in range(n))
        bio = io.BytesIO()
        with wave.open(bio, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(8000)
            wv.writeframes(pcm)
        rows.append((i, bytearray(bio.getvalue())))
    payloads = spark.createDataFrame(rows, "item_id long, payload binary")
    feats = extract_audio_features(payloads)
    return (
        feats.select(
            "item_id", "n_bytes", "n_channels", "sample_rate", "n_samples",
            F.round(F.col("duration_sec") * 1e6).cast("long")
            .alias("dur_micro"),
            F.round(F.col("rms") * 1e6).cast("long").alias("rms_micro"),
            F.posexplode("features").alias("bin", "_f"))
        .select(
            "item_id", "n_bytes", "n_channels", "sample_rate", "n_samples",
            "dur_micro", "rms_micro",
            F.col("bin").cast("int").alias("bin"),
            F.round(F.col("_f").cast("double") * F.col("n_samples"))
            .cast("long").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )


_AUDIO_FEATURES_SQL = """
    WITH d AS (SELECT doc_id, 200 + doc_id % 100 AS n
               FROM documents WHERE doc_id < 80),
    s AS (SELECT doc_id, n, unnest(range(0, n)) AS j FROM d),
    smp AS (SELECT doc_id, n,
                   (doc_id * 7919 + j * 104729) % 65536 - 32768 AS v
            FROM s),
    agg AS (SELECT doc_id, n,
                   sqrt(CAST(sum(v * v) AS DOUBLE) / n) AS rms
            FROM smp GROUP BY doc_id, n),
    hist AS (SELECT doc_id, n,
                    CAST(least(abs(v) // 2048, 15) AS INT) AS bin,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM smp GROUP BY doc_id, n, bin)
    SELECT h.doc_id AS item_id,
           CAST(44 + 2 * h.n AS BIGINT) AS n_bytes,
           1 AS n_channels, 8000 AS sample_rate,
           CAST(h.n AS BIGINT) AS n_samples,
           CAST(ROUND(h.n / 8000.0 * 1e6) AS BIGINT) AS dur_micro,
           CAST(ROUND(a.rms * 1e6) AS BIGINT) AS rms_micro,
           h.bin, h.cnt
    FROM hist h JOIN agg a ON a.doc_id = h.doc_id
"""


def _q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame-sampling shape (one input row → many sampled rows)
    over an opaque binary payload — pipeline/multimodal.py:
    frame_sample, all-JVM posexplode over a computed chunk index; the
    payload is each document's UTF-8 bytes, one frame per 64-byte
    chunk. The oracle regenerates the chunk indexes from
    octet_length."""
    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        frame_sample,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    return frame_sample(d, every_n_bytes=64, payload_col="payload",
                        id_col="doc_id")


_FRAME_SAMPLE_SQL = """
    WITH d AS (SELECT doc_id,
                      greatest(1, CAST(ceil(
                          octet_length(encode(text)) / 64.0) AS BIGINT))
                      AS nc
               FROM documents)
    SELECT doc_id, CAST(unnest(range(0, nc)) AS INT) AS frame_no FROM d
"""


def _q_canonical_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over 6 deterministic messy-spelling classes
    (case, default port, fragment, tracking params, query permutation,
    empty path) — pipeline/urlnorm.py:canonicalize_url, a pure codegen'd
    column expression (plan pinned UDF-free by tests/test_urlnorm.py)."""
    from neo4j_graph_algorithms_spark.pipeline.urlnorm import (
        canonicalize_url,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return (
        d.select("doc_id", _synth_url_variants().alias("url"))
        .select("doc_id", "url",
                canonicalize_url("url").alias("canonical_url"))
    )


def _canonical_urls_sql() -> str:
    parts = [f"u AS (SELECT doc_id, {_CANON_SYNTH_SQL} AS url "
             f"FROM documents)"]
    parts += _canon_url_cte_parts("doc_id")
    return ("WITH " + ",\n".join(parts) +
            "\nSELECT doc_id, url, canonical_url FROM canon")


def _q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup with latest-capture-wins: ~5 spelling
    variants per page (path keyed by doc_id % 97) collapse to one
    survivor by (capture_ts, url, doc_id) struct-max — ONE hash
    aggregation, no window/join (pipeline/urlnorm.py:url_dedup).
    capture_ts is a bigint here (not timestamp) so the oracle hash is
    timezone-free; ordering semantics are identical."""
    from neo4j_graph_algorithms_spark.pipeline.urlnorm import url_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id")
    page = (F.col("doc_id") % 97).cast("long")
    h = (page % 7).cast("string")
    p = page.cast("string")
    v = F.col("doc_id") % 6
    s = F.col("doc_id").cast("string")
    base = F.concat(F.lit("https://h"), h, F.lit(".example.org/p/"), p)
    url = (
        F.when(v == 0, F.concat(F.lit("HTTPS://H"), h,
                                F.lit(".Example.ORG/p/"), p,
                                F.lit("/?b=2&a=1")))
        .when(v == 1, F.concat(F.lit("https://h"), h,
                               F.lit(".example.org:443/p/"), p,
                               F.lit("?a=1&b=2&utm_source=x")))
        .when(v == 2, F.concat(base, F.lit("/?b=2&a=1#frag-"), s))
        .when(v == 3, F.concat(base, F.lit("?utm_campaign=y&a=1&b=2")))
        .when(v == 4, F.concat(base, F.lit("?b=2&gclid=z&a=1")))
        .otherwise(F.concat(base, F.lit("/?a=1&b=2")))
    )
    ts = (F.col("doc_id") * 7919) % 100000
    pages = d.select("doc_id", url.alias("url"),
                     ts.cast("long").alias("capture_ts"))
    out = url_dedup(pages, url_col="url", ts_col="capture_ts",
                    id_col="doc_id")
    return out.select(
        "canonical_url", F.col("doc_id").alias("winner_doc_id"),
        "n_variants")


def _url_dedup_sql() -> str:
    synth = """
      CASE CAST(doc_id % 6 AS INT)
        WHEN 0 THEN 'HTTPS://H' || CAST((doc_id % 97) % 7 AS VARCHAR)
          || '.Example.ORG/p/' || CAST(doc_id % 97 AS VARCHAR)
          || '/?b=2&a=1'
        WHEN 1 THEN 'https://h' || CAST((doc_id % 97) % 7 AS VARCHAR)
          || '.example.org:443/p/' || CAST(doc_id % 97 AS VARCHAR)
          || '?a=1&b=2&utm_source=x'
        WHEN 2 THEN 'https://h' || CAST((doc_id % 97) % 7 AS VARCHAR)
          || '.example.org/p/' || CAST(doc_id % 97 AS VARCHAR)
          || '/?b=2&a=1#frag-' || CAST(doc_id AS VARCHAR)
        WHEN 3 THEN 'https://h' || CAST((doc_id % 97) % 7 AS VARCHAR)
          || '.example.org/p/' || CAST(doc_id % 97 AS VARCHAR)
          || '?utm_campaign=y&a=1&b=2'
        WHEN 4 THEN 'https://h' || CAST((doc_id % 97) % 7 AS VARCHAR)
          || '.example.org/p/' || CAST(doc_id % 97 AS VARCHAR)
          || '?b=2&gclid=z&a=1'
        ELSE 'https://h' || CAST((doc_id % 97) % 7 AS VARCHAR)
          || '.example.org/p/' || CAST(doc_id % 97 AS VARCHAR)
          || '/?a=1&b=2'
      END
    """
    parts = [
        f"u AS (SELECT doc_id, {synth} AS url, "
        f"CAST((doc_id * 7919) % 100000 AS BIGINT) AS capture_ts "
        f"FROM documents)",
    ]
    parts += _canon_url_cte_parts("doc_id, capture_ts")
    parts.append(
        "ranked AS (SELECT canonical_url, doc_id, "
        "count(*) OVER (PARTITION BY canonical_url) AS n_variants, "
        "row_number() OVER (PARTITION BY canonical_url "
        "ORDER BY capture_ts DESC, url DESC, doc_id DESC) AS rn "
        "FROM canon)")
    return ("WITH " + ",\n".join(parts) +
            "\nSELECT canonical_url, doc_id AS winner_doc_id, "
            "CAST(n_variants AS BIGINT) AS n_variants "
            "FROM ranked WHERE rn = 1")


# ---------------------------------------------------------------------------
# Line-level curation family (pipeline/lines.py)
# ---------------------------------------------------------------------------

# documents.text is single-line; fold every 4 words into a line so the
# line operators have real multi-line input. Spark $1 == DuckDB \1; the
# 'g' flag matches Spark's replace-all default.
_SYNTH_LINES_RE = r"((\S+ ){3}\S+) "
_SYNTH_LINES_SQL = (r"regexp_replace(text, '((\S+ ){3}\S+) ', "
                    r"'\1' || chr(10), 'g')")


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact-line dedup (C4 span rule at line granularity,
    first occurrence by (doc_id, pos) wins) over documents folded to
    4-word lines — pipeline/lines.py:line_dedup: one explode, one
    line-keyed min-struct aggregation, one join back, one doc-keyed
    re-assembly."""
    from neo4j_graph_algorithms_spark.pipeline.lines import line_dedup

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace("text", _SYNTH_LINES_RE, "$1\n").alias("text"))
    return line_dedup(d)


def _line_dedup_sql() -> str:
    return f"""
    WITH u AS (SELECT doc_id, {_SYNTH_LINES_SQL} AS t FROM documents),
    l AS (SELECT doc_id, generate_subscripts(sl, 1) - 1 AS pos,
                 unnest(sl) AS line
          FROM (SELECT doc_id, string_split(t, chr(10)) AS sl FROM u)),
    w AS (SELECT line, doc_id, pos,
                 row_number() OVER (PARTITION BY line
                                    ORDER BY doc_id, pos) AS rn FROM l),
    k AS (SELECT doc_id, pos, line FROM w WHERE rn = 1),
    s AS (SELECT doc_id, count(*) AS kept_lines,
                 string_agg(line, chr(10) ORDER BY pos) AS clean_text
          FROM k GROUP BY doc_id),
    tot AS (SELECT doc_id,
                   CAST(len(string_split(t, chr(10))) AS BIGINT)
                     AS n_lines FROM u)
    SELECT t.doc_id, t.n_lines,
           CAST(coalesce(s.kept_lines, 0) AS BIGINT) AS kept_lines,
           coalesce(s.clean_text, '') AS clean_text
    FROM tot t LEFT JOIN s ON t.doc_id = s.doc_id
    """


def _q_boilerplate_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-site boilerplate detection (CCNet/trafilatura-style): a
    synthesized per-site NAV header + global footer line must flag as
    boilerplate at frac=0.5 while body lines score by their real
    per-site frequency — pipeline/lines.py:boilerplate_scores, keyed
    by (site, line) so cross-site common lines never form a global
    hot key."""
    from neo4j_graph_algorithms_spark.pipeline.lines import (
        boilerplate_scores,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.concat(
            F.lit("NAV-"), F.col("source"), F.lit("\n"),
            F.regexp_replace("text", _SYNTH_LINES_RE, "$1\n"),
            F.lit("\nCopyright Footer"),
        ).alias("text"))
    return boilerplate_scores(d, frac=0.5, min_site_docs=2)


def _boilerplate_sql() -> str:
    return f"""
    WITH u AS (SELECT doc_id, source,
                      'NAV-' || source || chr(10) || {_SYNTH_LINES_SQL}
                      || chr(10) || 'Copyright Footer' AS t
               FROM documents),
    l AS (SELECT doc_id, source, generate_subscripts(sl, 1) - 1 AS pos,
                 unnest(sl) AS line
          FROM (SELECT doc_id, source, string_split(t, chr(10)) AS sl
                FROM u)),
    pres AS (SELECT DISTINCT source, line, doc_id FROM l),
    pl AS (SELECT source, line, count(*) AS n_docs FROM pres
           GROUP BY source, line),
    st AS (SELECT source, count(*) AS site_docs FROM u GROUP BY source),
    fl AS (SELECT pl.source, pl.line,
                  (pl.n_docs >= st.site_docs * 0.5 AND st.site_docs >= 2)
                    AS is_bp
           FROM pl JOIN st ON pl.source = st.source),
    sc AS (SELECT l.doc_id, count(*) AS n_lines,
                  sum(CASE WHEN fl.is_bp THEN 1 ELSE 0 END) AS bp_lines
           FROM l JOIN fl ON l.source = fl.source AND l.line = fl.line
           GROUP BY l.doc_id)
    SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(bp_lines AS BIGINT) AS bp_lines,
           round(CAST(bp_lines AS DOUBLE) / n_lines, 6) AS bp_frac
    FROM sc
    """


# ---------------------------------------------------------------------------
# SimRank (operators/simrank.py)
# ---------------------------------------------------------------------------

def _q_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimRank structural similarity on the induced id<40 subgraph,
    3 supersteps at C=0.8 — operators/simrank.py:simrank, the pair-
    lattice superstep loop (two edge joins + one pair-keyed agg per
    step). Fixed iteration count + pure arithmetic = fully unrolled
    SQL replay (_simrank_unrolled_sql)."""
    from neo4j_graph_algorithms_spark.operators.simrank import simrank

    e = _edges(spark, sf_dir).where(
        (F.col("src") < 40) & (F.col("dst") < 40))
    out = simrank(e, c=0.8, iterations=3)
    return out.select(
        "a", "b", F.round("similarity", 6).alias("similarity"))


def _simrank_unrolled_sql(iters: int, c: float, n_sub: int) -> str:
    parts = [
        _EDGES_CTE,
        f"sedges AS MATERIALIZED (SELECT src, dst FROM edges "
        f"WHERE src < {n_sub} AND dst < {n_sub})",
        "snodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM sedges "
        "UNION ALL SELECT dst FROM sedges))",
        "ind AS MATERIALIZED (SELECT dst, count(*) AS ind FROM sedges "
        "GROUP BY dst)",
        "s0 AS (SELECT id AS x, id AS y, CAST(1.0 AS DOUBLE) AS s "
        "FROM snodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"m{i} AS (SELECT ea.dst AS a, eb.dst AS b, sum(p.s) AS t "
            f"FROM s{i-1} p JOIN sedges ea ON ea.src = p.x "
            f"JOIN sedges eb ON eb.src = p.y GROUP BY ea.dst, eb.dst)")
        parts.append(
            f"o{i} AS (SELECT m.a, m.b, {c!r} * m.t / (ia.ind * ib.ind) "
            f"AS s FROM m{i} m JOIN ind ia ON ia.dst = m.a "
            f"JOIN ind ib ON ib.dst = m.b WHERE m.a <> m.b)")
        parts.append(
            f"s{i} AS (SELECT id AS x, id AS y, CAST(1.0 AS DOUBLE) AS s "
            f"FROM snodes UNION ALL SELECT a, b, s FROM o{i})")
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT x AS a, y AS b, round(s, 6) AS similarity "
            f"FROM s{iters} WHERE x < y AND s > 0")


# ---------------------------------------------------------------------------
# Random projection (pipeline/projection.py)
# ---------------------------------------------------------------------------

def _q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL Rademacher projection 64→8 dims, exploded to (vec_id, k,
    value) — pipeline/projection.py:random_project, a map-only
    codegen'd fold with the ±1 matrix folded into the plan as
    constants. The oracle regenerates the IDENTICAL matrix from the
    splitmix64(d·K + k ⊕ mix(seed)) arithmetic in SQL."""
    from neo4j_graph_algorithms_spark.pipeline.projection import (
        random_project,
    )

    emb = _t(spark, sf_dir, "embeddings")
    out = random_project(emb, out_dim=8, seed=42)
    return (
        out.select("vec_id", F.posexplode("projected").alias("k", "value"))
        .select("vec_id", "k", F.round("value", 6).alias("value"))
    )


def _random_projection_sql(in_dim: int, out_dim: int, seed: int) -> str:
    from neo4j_graph_algorithms_spark.pipeline.projection import _mix64
    import numpy as np

    seedmix = int(_mix64(np.uint64(seed) * np.ones(1, dtype=np.uint64))[0])
    parts = [
        f"pm0 AS (SELECT CAST(d.range AS UBIGINT) AS d, "
        f"CAST(k.range AS UBIGINT) AS k, "
        f"xor(CAST(d.range * {out_dim} + k.range AS UBIGINT), "
        f"CAST({seedmix} AS UBIGINT)) AS x "
        f"FROM range({in_dim}) d CROSS JOIN range({out_dim}) k)",
    ]
    parts += _mix64_chain("pm", "d, k")
    parts += [
        "proj AS MATERIALIZED (SELECT d, k, CASE WHEN x & 1 = 1 "
        "THEN 1.0 ELSE -1.0 END AS sign FROM pm4)",
        "e AS (SELECT vec_id, "
        "CAST(generate_subscripts(embedding, 1) - 1 AS UBIGINT) AS d, "
        "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)",
    ]
    return (
        "WITH " + ",\n".join(parts) +
        f"\nSELECT e.vec_id, CAST(p.k AS INT) AS k, "
        f"round(sum(e.v * p.sign) / sqrt({out_dim}), 6) AS value "
        f"FROM e JOIN proj p ON e.d = p.d GROUP BY e.vec_id, p.k"
    )


# ---------------------------------------------------------------------------
# Leiden-style connectivity refinement (operators/refinement.py)
# ---------------------------------------------------------------------------

def _q_louvain_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain one-level labels (4 deterministic parity rounds, the
    oracle-checked variant) upgraded to Leiden's connectivity
    guarantee: operators/refinement.py splits every internally-
    disconnected community by one WCC over the intra-community edge
    set. Output (id, community, refined_community)."""
    from neo4j_graph_algorithms_spark.operators.louvain import (
        louvain_one_level,
    )
    from neo4j_graph_algorithms_spark.operators.refinement import (
        split_disconnected_communities,
    )

    e = _sub_edges(spark, sf_dir)
    lab = louvain_one_level(_vertices(e), e, rounds=4)
    return split_disconnected_communities(lab, e).labels


def _louvain_refined_sql(rounds: int) -> str:
    """_louvain_onelevel_sql composed with an intra-community WCC
    (recursive CTE, mirroring _WCC_SQL) — 'e' is already the symmetric
    non-loop weighted edge CTE, so both directions feed the recursion."""
    extra = [
        f"intra AS MATERIALIZED (SELECT e.src, e.dst FROM e "
        f"JOIN lab{rounds} a ON a.id = e.src "
        f"JOIN lab{rounds} b ON b.id = e.dst "
        f"WHERE a.community = b.community)",
    ]
    # the recursion lives in a NESTED subquery with its own WITH
    # RECURSIVE: a top-level RECURSIVE prefix makes DuckDB re-evaluate
    # the entire (otherwise MATERIALIZED) Louvain round chain per
    # recursive step — measured: 0.2 s plain vs >120 s with the prefix
    # on the identical chain
    final = (
        f"SELECT l.id, l.community, r.refined AS refined_community "
        f"FROM lab{rounds} l JOIN ("
        "WITH RECURSIVE rr(id, comp) AS ("
        "SELECT id, id FROM verts "
        "UNION "
        "SELECT intra.dst, rr.comp FROM rr JOIN intra "
        "ON intra.src = rr.id AND intra.dst <> rr.comp) "
        "SELECT id, min(comp) AS refined FROM rr GROUP BY id"
        ") r ON r.id = l.id")
    return _louvain_onelevel_sql(rounds, final_select=final,
                                 extra_ctes=extra)


# ---------------------------------------------------------------------------
# CCNet perplexity bucketing (pipeline/text.py:perplexity_buckets)
# ---------------------------------------------------------------------------

def _q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail split: per-language exact-percentile
    thresholds over the 6-dp LM scores (model-sized agg + one broadcast
    join — no per-language window sort). Self-trained model, the same
    rounding contract as ngram_lm_score."""
    from neo4j_graph_algorithms_spark.pipeline.text import (
        perplexity_buckets,
    )

    return perplexity_buckets(_t(spark, sf_dir, "documents"))


_PERPLEXITY_BUCKETS_SQL = f"""
    WITH grams AS (
        SELECT doc_id, substr(text, i, 3) AS g
        FROM documents,
             UNNEST(generate_series(1, length(text) - 2)) AS t(i)
    ),
    tric AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
    ctxc AS (SELECT substr(g, 1, 2) AS ctx, sum(c) AS cc
             FROM tric GROUP BY 1),
    vv AS (SELECT count(DISTINCT substr(g, 3, 1)) AS v FROM tric),
    sc AS (SELECT doc_id,
                  round(-sum(ln((c + 1.0) /
                                (cc + 1.0 * (SELECT v FROM vv))))
                        / count(*), 6) AS cross_entropy
           FROM grams
           JOIN ctxc ON substr(g, 1, 2) = ctx
           JOIN tric USING (g)
           GROUP BY doc_id),
    sl AS (SELECT d.doc_id, d.lang, s.cross_entropy
           FROM documents d JOIN sc s USING (doc_id)),
    th AS (SELECT lang,
                  round(quantile_cont(cross_entropy,
                                      {1.0 / 3.0!r}), 6) AS t1,
                  round(quantile_cont(cross_entropy,
                                      {2.0 / 3.0!r}), 6) AS t2
           FROM sl GROUP BY lang)
    SELECT sl.doc_id, sl.lang, sl.cross_entropy,
           CASE WHEN cross_entropy <= t1 THEN 'head'
                WHEN cross_entropy <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM sl JOIN th USING (lang)
"""


def _q_streaming_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained canonical-URL dedup: the url_dedup
    pages arrive as FOUR crawl-drop micro-batches
    (streaming/dedup.py:run_url_dedup_maintenance — latest-wins
    struct-max merge per batch, durable registry). Latest-wins is a
    commutative monoid over (max struct, sum count), so the maintained
    registry equals batch url_dedup in ANY drop order — the oracle is
    _url_dedup_sql() verbatim."""
    import tempfile

    from neo4j_graph_algorithms_spark.streaming.dedup import (
        run_url_dedup_maintenance,
    )

    root = tempfile.mkdtemp(prefix="nga_stream_url_")
    drops = os.path.join(root, "pages")
    os.makedirs(drops)
    d = _t(spark, sf_dir, "documents").select("doc_id")
    page = (F.col("doc_id") % 97).cast("long")
    h = (page % 7).cast("string")
    p = page.cast("string")
    v = F.col("doc_id") % 6
    s = F.col("doc_id").cast("string")
    base = F.concat(F.lit("https://h"), h, F.lit(".example.org/p/"), p)
    url = (
        F.when(v == 0, F.concat(F.lit("HTTPS://H"), h,
                                F.lit(".Example.ORG/p/"), p,
                                F.lit("/?b=2&a=1")))
        .when(v == 1, F.concat(F.lit("https://h"), h,
                               F.lit(".example.org:443/p/"), p,
                               F.lit("?a=1&b=2&utm_source=x")))
        .when(v == 2, F.concat(base, F.lit("/?b=2&a=1#frag-"), s))
        .when(v == 3, F.concat(base, F.lit("?utm_campaign=y&a=1&b=2")))
        .when(v == 4, F.concat(base, F.lit("?b=2&gclid=z&a=1")))
        .otherwise(F.concat(base, F.lit("/?a=1&b=2")))
    )
    pages = d.select(
        url.alias("url"),
        ((F.col("doc_id") * 7919) % 100000).cast("long")
        .alias("capture_ts"),
        "doc_id")
    for i in range(4):
        stage = os.path.join(root, f"stage{i}")
        (pages.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
         .coalesce(1).write.mode("overwrite").parquet(stage))
        part = next(f for f in sorted(os.listdir(stage))
                    if f.endswith(".parquet"))
        os.rename(os.path.join(stage, part),
                  os.path.join(drops, f"drop{i}.parquet"))
    out = run_url_dedup_maintenance(
        spark, drops, os.path.join(root, "state"),
        max_files_per_trigger=1)
    return out.select(
        "canonical_url", F.col("doc_id").alias("winner_doc_id"),
        "n_variants")


def _q_streaming_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained Count-Min token-frequency sketch: the
    documents table arrives as FOUR crawl-drop micro-batches
    (streaming/dedup.py:run_cms_maintenance); each drop's 4x1024
    sketch folds into the durable counter table with cms_merge.
    Counters are a commutative monoid under cell-wise addition, so the
    maintained table equals the batch sketch of the whole corpus
    cell-for-cell in ANY drop order — the oracle replays that batch
    sketch bit-for-bit (every counter an exact integer)."""
    import tempfile

    from neo4j_graph_algorithms_spark.streaming.dedup import (
        run_cms_maintenance,
    )

    root = tempfile.mkdtemp(prefix="nga_stream_cms_")
    drops = os.path.join(root, "docs")
    os.makedirs(drops)
    docs = _t(spark, sf_dir, "documents")
    for i in range(4):
        stage = os.path.join(root, f"stage{i}")
        (docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
         .coalesce(1).write.mode("overwrite").parquet(stage))
        part = next(f for f in sorted(os.listdir(stage))
                    if f.endswith(".parquet"))
        os.rename(os.path.join(stage, part),
                  os.path.join(drops, f"drop{i}.parquet"))
    out = run_cms_maintenance(
        spark, drops, os.path.join(root, "state"),
        depth=4, width=1024, max_files_per_trigger=1)
    return out.select(
        F.col("d").cast("int").alias("d"),
        F.col("idx").cast("long").alias("idx"),
        F.col("cnt").cast("long").alias("cnt"))


def _streaming_cms_sql(depth: int = 4, width: int = 1024) -> str:
    # the batch sketch of the whole corpus — what the fold must equal
    cms_parts = " UNION ALL ".join(
        f"SELECT {d} AS d, "
        f"CAST(('0x' || substr(md5(tok || '#cms{d}'), 1, 8)) AS BIGINT) "
        f"% {width} AS idx, count(*) AS cnt FROM toks GROUP BY idx"
        for d in range(depth))
    return f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '),
                                x -> x <> '')) AS tok
      FROM documents)
    SELECT CAST(d AS INT) AS d, idx, CAST(cnt AS BIGINT) AS cnt
    FROM ({cms_parts})
    """


# ---------------------------------------------------------------------------
# BPE merge training (pipeline/bpe.py)
# ---------------------------------------------------------------------------

def _q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6 BPE merge rounds over documents — pipeline/bpe.py:bpe_train.
    One corpus pass (word counts), then vocab-sized rounds: in-row pair
    expansion → weighted argmax (count DESC, pair ASC) → left-to-right
    non-overlapping merge as a codegen'd array fold. The oracle
    restates the sweep NON-sequentially (candidate runs via
    gaps-and-islands, even ranks selected, skip-next rebuild)."""
    from neo4j_graph_algorithms_spark.pipeline.bpe import bpe_train

    return bpe_train(_t(spark, sf_dir, "documents"), n_merges=6)


def _bpe_train_sql(n_merges: int) -> str:
    parts = [
        "w0 AS MATERIALIZED (SELECT word, count(*) AS freq FROM ("
        "SELECT replace(x, '|', '') AS word FROM ("
        "SELECT unnest(string_split_regex(text, '\\s+')) AS x "
        "FROM documents) WHERE x <> '') WHERE word <> '' GROUP BY word)",
        "s0 AS MATERIALIZED (SELECT word AS w, "
        "list_append(string_split(word, ''), '</w>') AS syms, freq "
        "FROM w0)",
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts += [
            # adjacent pairs with their position
            f"e{r} AS MATERIALIZED (SELECT w, freq, CAST(i AS INT) AS i, "
            f"syms[CAST(i AS INT)] AS a, syms[CAST(i AS INT)+1] AS b "
            f"FROM s{p}, UNNEST(range(1, len(syms))) AS t(i))",
            f"cnt{r} AS (SELECT a, b, sum(freq) AS c FROM e{r} "
            f"GROUP BY a, b)",
            f"t{r} AS MATERIALIZED (SELECT a, b, c FROM cnt{r} "
            f"ORDER BY c DESC, a, b LIMIT 1)",
            # greedy non-overlap: group consecutive candidate positions
            # (gaps-and-islands), keep even ranks within each run
            f"cand{r} AS (SELECT e.w, e.i FROM e{r} e "
            f"JOIN t{r} ON e.a = t{r}.a AND e.b = t{r}.b)",
            f"sel{r} AS (SELECT w, i, row_number() OVER "
            f"(PARTITION BY w, i - rn ORDER BY i) AS rr FROM ("
            f"SELECT w, i, row_number() OVER (PARTITION BY w ORDER BY i) "
            f"AS rn FROM cand{r}))",
            f"self{r} AS MATERIALIZED (SELECT w, i FROM sel{r} "
            f"WHERE (rr - 1) % 2 = 0)",
            # rebuild: selected position emits the merged symbol, the
            # position after a selected one is skipped
            f"pos{r} AS (SELECT w, freq, syms, CAST(j AS INT) AS j "
            f"FROM s{p}, UNNEST(range(1, len(syms)+1)) AS t(j))",
            f"reb{r} AS (SELECT p.w, p.freq, p.j, "
            f"CASE WHEN sel.i IS NOT NULL THEN (SELECT a || b FROM t{r}) "
            f"WHEN skp.i IS NOT NULL THEN NULL "
            f"ELSE p.syms[p.j] END AS sym "
            f"FROM pos{r} p "
            f"LEFT JOIN self{r} sel ON sel.w = p.w AND sel.i = p.j "
            f"LEFT JOIN self{r} skp ON skp.w = p.w AND skp.i = p.j - 1)",
            f"s{r} AS MATERIALIZED (SELECT w, freq, "
            f"list(sym ORDER BY j) FILTER (WHERE sym IS NOT NULL) "
            f"AS syms FROM reb{r} GROUP BY w, freq)",
        ]
    outs = [
        f"SELECT {r} AS merge_rank, a AS \"left\", b AS \"right\", "
        f"a || b AS merged, CAST(c AS BIGINT) AS pair_count FROM t{r}"
        for r in range(1, n_merges + 1)
    ]
    return ("WITH " + ",\n".join(parts) + "\n" +
            " UNION ALL ".join(outs))


def _bpe_encode_sql(n_merges: int) -> str:
    """Per-doc token counts under the trained merges: the training
    chain's final vocab state s{n} IS the encoded spelling of every
    word — join it back to the corpus words and aggregate."""
    train = _bpe_train_sql(n_merges)
    parts_blob = train.split("WITH ", 1)[1].rsplit("\n", 1)[0]
    # strip the UNION ALL output tail; keep the CTE chain
    parts_blob = parts_blob.rsplit("SELECT 1 AS merge_rank", 1)[0]
    parts_blob = parts_blob.rstrip().rstrip(",")
    extra = f""",
    docw AS (SELECT doc_id, word FROM (
        SELECT doc_id, replace(x, '|', '') AS word FROM (
            SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS x
            FROM documents) WHERE x <> '') WHERE word <> ''),
    enc AS (SELECT w, len(syms) AS ntok FROM s{n_merges}),
    agg AS (SELECT doc_id, count(*) AS n_words, sum(ntok) AS n_tokens
            FROM docw JOIN enc ON docw.word = enc.w GROUP BY doc_id)
    SELECT d.doc_id, CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents d LEFT JOIN agg a USING (doc_id)"""
    # note: the trailing SELECT replaces the training output
    return "WITH " + parts_blob + extra


# ---------------------------------------------------------------------------
# Who-To-Follow (operators/wtf.py)
# ---------------------------------------------------------------------------

def _q_who_to_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WTF recommendations for user 0: PPR circle of trust (top-20 at
    9-dp rounding, id tie-break) → SALSA on the circle-induced
    bipartite subgraph → top-10 unfollowed authorities
    (operators/wtf.py, Gupta et al. WWW'13). Pure composition of the
    engine's personalized PageRank and SALSA — the oracle chains the
    same two unrolled recurrences."""
    from neo4j_graph_algorithms_spark.operators.wtf import who_to_follow

    e = _edges(spark, sf_dir)
    res = who_to_follow(_vertices(e), e, 0, circle_k=20,
                        ppr_iterations=8, salsa_iterations=8, top_n=10)
    return res.recommendations.select(
        "id", F.round("score", 6).alias("score"))


def _wtf_sql(ppr_iters: int, salsa_iters: int, user: int,
             circle_k: int, top_n: int) -> str:
    base = f"CASE WHEN id = {user} THEN 0.15 ELSE 0.0 END"
    parts = [
        _EDGES_CTE, _NODES_CTE,
        "deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src)",
        "fac AS MATERIALIZED (SELECT e.src, e.dst, 1.0 / d.outd "
        "AS factor FROM edges e JOIN deg d ON e.src = d.src)",
        f"r0 AS MATERIALIZED (SELECT id, CAST({base} AS DOUBLE) AS rank "
        f"FROM nodes)",
    ]
    for i in range(1, ppr_iters + 1):
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT f.dst AS id, "
            f"sum(r.rank * f.factor) AS msg "
            f"FROM fac f JOIN r{i-1} r ON f.src = r.id GROUP BY f.dst)")
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT n.id, "
            f"{base.replace('id', 'n.id')} + 0.85 * coalesce(m.msg, 0.0) "
            f"AS rank FROM nodes n LEFT JOIN m{i} m ON n.id = m.id)")
    parts += [
        f"circle AS MATERIALIZED (SELECT id FROM ("
        f"SELECT id, round(rank, 9) AS rank9 FROM r{ppr_iters} "
        f"WHERE id <> {user}) WHERE rank9 > 0 "
        f"ORDER BY rank9 DESC, id LIMIT {circle_k})",
        "bedges AS MATERIALIZED (SELECT e.src, e.dst FROM edges e "
        "JOIN circle c ON e.src = c.id)",
        "bnodes AS MATERIALIZED (SELECT DISTINCT id FROM ("
        "SELECT src AS id FROM bedges UNION ALL SELECT dst FROM bedges))",
    ]
    parts += _salsa_rounds_sql(salsa_iters, tag="w", edges="bedges",
                               nodes="bnodes")
    parts.append(
        f"followed AS (SELECT DISTINCT dst AS id FROM edges "
        f"WHERE src = {user})")
    return (
        "WITH " + ",\n".join(parts) +
        f"\nSELECT id, round(score9, 6) AS score FROM ("
        f"SELECT s.id, round(s.auth, 9) AS score9 FROM w{salsa_iters} s "
        f"LEFT JOIN followed f ON f.id = s.id "
        f"WHERE f.id IS NULL AND s.id <> {user}) "
        f"WHERE score9 > 0 ORDER BY score9 DESC, id LIMIT {top_n}"
    )


def _q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize under the corpus's own 6-merge BPE table — train then
    encode (pipeline/bpe.py:bpe_encode): merge folds on the distinct
    word table, one word-keyed join back, one doc-keyed agg. Oracle
    reuses the training CTE chain (its final vocab state IS the
    encoding) + a corpus join."""
    from neo4j_graph_algorithms_spark.pipeline.bpe import (
        bpe_encode,
        bpe_train,
    )

    docs = _t(spark, sf_dir, "documents")
    return bpe_encode(docs, bpe_train(docs, n_merges=6))


# ---------------------------------------------------------------------------
# Mirror hosts + crawl frontier (operators/hostgraph.py)
# ---------------------------------------------------------------------------

def _q_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bharat-Broder mirror detection over documents sharded onto 10
    synthetic hosts: the corpus's exact-duplicate texts land on
    different hosts and must pair them; hot fingerprints are pruned
    before the self-join (operators/hostgraph.py:mirror_hosts)."""
    from neo4j_graph_algorithms_spark.operators.hostgraph import (
        mirror_hosts,
    )

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 10).cast("string"),
                 F.lit(".example.org/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        "text")
    return mirror_hosts(pages, min_shared=1, df_cutoff=1000)


_MIRROR_HOSTS_SQL = f"""
    WITH p AS (SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR)
                      || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                      AS url, text FROM documents),
    fp AS (SELECT DISTINCT
               lower(regexp_extract(url, '{_HOST_RE_SQL}', 1)) AS host,
               md5(text) AS fp FROM p),
    hot AS (SELECT fp, count(*) AS nh FROM fp GROUP BY fp),
    cool AS MATERIALIZED (SELECT f.host, f.fp FROM fp f
                          JOIN hot h ON f.fp = h.fp AND h.nh <= 1000),
    sz AS (SELECT host, count(*) AS s FROM cool GROUP BY host),
    sh AS (SELECT a.host AS host_a, b.host AS host_b,
                  count(*) AS shared
           FROM cool a JOIN cool b ON a.fp = b.fp AND a.host < b.host
           GROUP BY 1, 2 HAVING count(*) >= 1)
    SELECT sh.host_a, sh.host_b, CAST(sh.shared AS BIGINT) AS shared,
           round(CAST(sh.shared AS DOUBLE)
                 / (sa.s + sb.s - sh.shared), 6) AS resemblance
    FROM sh JOIN sz sa ON sa.host = sh.host_a
    JOIN sz sb ON sb.host = sh.host_b
"""


def _q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier discovery on the 2000-page / 8-host synthetic crawl
    with only the first 1500 pages crawled: uncrawled link targets
    ranked by distinct in-links and distinct linking hosts
    (operators/hostgraph.py:crawl_frontier)."""
    from neo4j_graph_algorithms_spark.operators.hostgraph import (
        crawl_frontier,
    )
    from neo4j_graph_algorithms_spark.sources import (
        extract_edges,
        generate_pages,
    )
    from neo4j_graph_algorithms_spark.sources.pages import page_url

    pages = generate_pages(spark, 2000, n_hosts=8)
    edges = extract_edges(pages)
    crawled = spark.range(1500).select(
        F.concat(F.lit("https://h"), (F.col("id") % 8).cast("string"),
                 F.lit(".example.org/p/"),
                 F.col("id").cast("string")).alias("url"))
    assert page_url(3, 8) == "https://h3.example.org/p/3"
    return crawl_frontier(edges, crawled)


def _crawl_frontier_sql(n: int, n_hosts: int, crawled_n: int) -> str:
    parts = _pages_linklist_parts(n, n_hosts=n_hosts) + [
        "uedges AS MATERIALIZED (SELECT DISTINCT src_url, dst_url "
        "FROM plinks)",
        f"crawled AS (SELECT {_sql_page_url('i', n_hosts)} AS url FROM "
        f"(SELECT CAST(range AS UBIGINT) AS i FROM range({crawled_n})))",
        "fresh AS (SELECT e.src_url, e.dst_url FROM uedges e "
        "LEFT JOIN crawled c ON c.url = e.dst_url WHERE c.url IS NULL)",
    ]
    return (
        "WITH " + ",\n".join(parts) +
        f"\nSELECT dst_url AS url, count(*) AS n_inlinks, "
        f"count(DISTINCT lower(regexp_extract(src_url, "
        f"'{_HOST_RE_SQL}', 1))) AS n_src_hosts "
        f"FROM fresh GROUP BY dst_url"
    )


# ---------------------------------------------------------------------------
# Maximal matching (operators/matching.py)
# ---------------------------------------------------------------------------

def _q_maximal_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locally-minimal-edge maximal matching, 6 deterministic rounds
    (md5 total-order priorities, the mis.py contract) —
    operators/matching.py. Fixed rounds → fully unrolled SQL replay."""
    from neo4j_graph_algorithms_spark.operators.matching import (
        maximal_matching,
    )

    e = _edges(spark, sf_dir)
    return maximal_matching(e, seed=42, max_rounds=6).matching


def _matching_round_parts(rounds: int, seed: int, *, tag: str,
                          src_cte: str) -> list[str]:
    """CTE chain for ``rounds`` locally-minimal-edge matching rounds
    over canonical edge CTE ``src_cte`` (columns lo, hi). Final
    selections are ``{tag}sel{r}``, live set ``{tag}le{r}`` — shared
    by the matching/coarsen/cover/bisection oracles."""
    t = tag
    parts = [f"{t}le0 AS MATERIALIZED (SELECT lo, hi FROM {src_cte})"]
    for r in range(1, rounds + 1):
        pri = (f"md5('{seed}|{r}|' || CAST(lo AS VARCHAR) || '|' || "
               f"CAST(hi AS VARCHAR)) || '-' || "
               f"lpad(CAST(lo AS VARCHAR), 12, '0') || '-' || "
               f"lpad(CAST(hi AS VARCHAR), 12, '0')")
        parts += [
            f"{t}pr{r} AS MATERIALIZED (SELECT lo, hi, {pri} AS p "
            f"FROM {t}le{r-1})",
            f"{t}inc{r} AS (SELECT lo AS v, p FROM {t}pr{r} "
            f"UNION ALL SELECT hi, p FROM {t}pr{r})",
            f"{t}vm{r} AS MATERIALIZED (SELECT v, min(p) AS m "
            f"FROM {t}inc{r} GROUP BY v)",
            f"{t}sel{r} AS MATERIALIZED (SELECT e.lo, e.hi "
            f"FROM {t}pr{r} e "
            f"JOIN {t}vm{r} a ON a.v = e.lo AND e.p = a.m "
            f"JOIN {t}vm{r} b ON b.v = e.hi AND e.p = b.m)",
            f"{t}mv{r} AS (SELECT lo AS v FROM {t}sel{r} "
            f"UNION SELECT hi FROM {t}sel{r})",
            f"{t}le{r} AS MATERIALIZED (SELECT l.lo, l.hi "
            f"FROM {t}le{r-1} l "
            f"LEFT JOIN {t}mv{r} a ON a.v = l.lo "
            f"LEFT JOIN {t}mv{r} b ON b.v = l.hi "
            f"WHERE a.v IS NULL AND b.v IS NULL)",
        ]
    return parts


_CANON_EDGES_CTE = (
    "ce0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS lo, "
    "greatest(src, dst) AS hi FROM edges WHERE src <> dst)")


def _matching_unrolled_sql(rounds: int, seed: int) -> str:
    parts = [_EDGES_CTE, _CANON_EDGES_CTE]
    parts += _matching_round_parts(rounds, seed, tag="", src_cte="ce0")
    outs = [
        f"SELECT lo AS u, hi AS v, CAST({r} AS INT) AS round FROM sel{r}"
        for r in range(1, rounds + 1)
    ]
    return ("WITH " + ",\n".join(parts) + "\n" +
            " UNION ALL ".join(outs))


def _q_coarsen_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METIS-style coarsening step: contract the 6-round matching's
    pairs to min-endpoint supervertices, re-aggregate edges
    (operators/matching.py:coarsen_graph — vertex-sized broadcast
    remap, one hash aggregation)."""
    from neo4j_graph_algorithms_spark.operators.matching import (
        coarsen_graph,
        maximal_matching,
    )

    e = _edges(spark, sf_dir)
    m = maximal_matching(e, seed=42, max_rounds=6).matching
    return coarsen_graph(e, m)


def _coarsen_matching_sql(rounds: int, seed: int) -> str:
    parts = [_EDGES_CTE, _CANON_EDGES_CTE]
    parts += _matching_round_parts(rounds, seed, tag="", src_cte="ce0")
    m_union = " UNION ALL ".join(
        f"SELECT lo AS u, hi AS v FROM sel{r}"
        for r in range(1, rounds + 1))
    parts += [
        f"mm AS ({m_union})",
        "remap AS MATERIALIZED (SELECT u AS id, least(u, v) AS super "
        "FROM mm UNION ALL SELECT v, least(u, v) FROM mm)",
        "rl AS (SELECT coalesce(a.super, e.src) AS src, "
        "coalesce(b.super, e.dst) AS dst FROM edges e "
        "LEFT JOIN remap a ON a.id = e.src "
        "LEFT JOIN remap b ON b.id = e.dst)",
    ]
    return ("WITH " + ",\n".join(parts) +
            "\nSELECT src, dst, CAST(count(*) AS BIGINT) AS weight "
            "FROM rl WHERE src <> dst GROUP BY src, dst")


def _q_vertex_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-approx vertex cover = matched endpoints of the 6-round
    matching (operators/matching.py:vertex_cover_2approx)."""
    from neo4j_graph_algorithms_spark.operators.matching import (
        vertex_cover_2approx,
    )

    return vertex_cover_2approx(_edges(spark, sf_dir), seed=42,
                                max_rounds=6)


def _vertex_cover_sql(rounds: int, seed: int) -> str:
    parts = [_EDGES_CTE, _CANON_EDGES_CTE]
    parts += _matching_round_parts(rounds, seed, tag="", src_cte="ce0")
    m_union = " UNION ALL ".join(
        f"SELECT lo AS u, hi AS v FROM sel{r}"
        for r in range(1, rounds + 1))
    parts.append(f"mm AS ({m_union})")
    return ("WITH " + ",\n".join(parts) +
            "\nSELECT DISTINCT id FROM (SELECT u AS id FROM mm "
            "UNION ALL SELECT v FROM mm)")


# ---------------------------------------------------------------------------
# Multilevel bisection (operators/partitioning.py)
# ---------------------------------------------------------------------------

def _q_multilevel_bisect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METIS-style V-cycle on the engine's own primitives: 2 levels of
    (6-round matching → contraction), rank-parity split of the
    coarsest supervertices, labels projected back through the remap
    chain (operators/partitioning.py). Fully deterministic → the
    oracle chains two tagged matching/coarsen CTE levels + a
    row_number parity."""
    from neo4j_graph_algorithms_spark.operators.partitioning import (
        multilevel_bisect,
    )

    e = _edges(spark, sf_dir)
    res = multilevel_bisect(e, levels=2, rounds_per_level=6, seed=42)
    return res.labels.select("id", F.col("part").cast("int").alias("part"))


def _bisect_sql(levels: int, rounds: int, seed: int) -> str:
    parts = [_EDGES_CTE, _CANON_EDGES_CTE]
    tags = "abcdefgh"
    prev_edges = "ce0"
    remaps = []
    for lvl in range(1, levels + 1):
        t = tags[lvl - 1]
        parts += _matching_round_parts(rounds, seed + lvl, tag=t,
                                       src_cte=prev_edges)
        m_union = " UNION ALL ".join(
            f"SELECT lo AS u, hi AS v FROM {t}sel{r}"
            for r in range(1, rounds + 1))
        parts += [
            f"{t}mm AS ({m_union})",
            f"remap{lvl} AS MATERIALIZED (SELECT u AS id, "
            f"least(u, v) AS super FROM {t}mm "
            f"UNION ALL SELECT v, least(u, v) FROM {t}mm)",
            f"cc{lvl} AS (SELECT coalesce(ra.super, e.lo) AS src, "
            f"coalesce(rb.super, e.hi) AS dst FROM {prev_edges} e "
            f"LEFT JOIN remap{lvl} ra ON ra.id = e.lo "
            f"LEFT JOIN remap{lvl} rb ON rb.id = e.hi)",
            f"ce{lvl} AS MATERIALIZED (SELECT DISTINCT "
            f"least(src, dst) AS lo, greatest(src, dst) AS hi "
            f"FROM cc{lvl} WHERE src <> dst)",
        ]
        remaps.append(f"remap{lvl}")
        prev_edges = f"ce{lvl}"
    parts.append("v0 AS (SELECT lo AS id FROM ce0 "
                 "UNION SELECT hi FROM ce0)")
    prev_cur = None
    for lvl in range(1, levels + 1):
        src = ("v0 v" if prev_cur is None else f"{prev_cur} v")
        rep_in = "v.id" if prev_cur is None else "v.rep"
        parts.append(
            f"cur{lvl} AS MATERIALIZED (SELECT v.id, "
            f"coalesce(r.super, {rep_in}) AS rep FROM {src} "
            f"LEFT JOIN remap{lvl} r ON r.id = {rep_in})")
        prev_cur = f"cur{lvl}"
    parts += [
        f"reps AS (SELECT DISTINCT rep AS id FROM {prev_cur})",
        "pt AS MATERIALIZED (SELECT id, "
        "(row_number() OVER (ORDER BY id) - 1) % 2 AS part FROM reps)",
    ]
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT c.id, CAST(p.part AS INT) AS part "
            f"FROM {prev_cur} c JOIN pt p ON p.id = c.rep")


# ---------------------------------------------------------------------------
# HLL sketch tables (pipeline/sketches.py)
# ---------------------------------------------------------------------------

def _q_hll_source_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durable-sketch primitive: per-source HLL registers over document
    texts (one max aggregation, m=64 int columns) → bias-corrected
    estimate via the SAME expression text the oracle evaluates
    (pipeline/sketches.py + operators/hyperball.py:hll_estimate_sql)."""
    from neo4j_graph_algorithms_spark.pipeline.sketches import (
        hll_cardinality,
        hll_group_sketches,
    )

    d = _t(spark, sf_dir, "documents")
    sk = hll_group_sketches(d, ["source"], "text", b=6)
    return hll_cardinality(sk, ["source"], b=6)


def _hll_source_distinct_sql(b: int) -> str:
    from neo4j_graph_algorithms_spark.operators.hyperball import (
        hll_estimate_sql,
    )

    m = 1 << b
    cap = 60 - b + 1
    regs = ", ".join(
        f"CAST(max(CASE WHEN j = {j} THEN rho ELSE 0 END) AS INT) AS r{j}"
        for j in range(m))
    return f"""
    WITH v AS (SELECT source,
                 CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS u
               FROM documents),
    jr AS (SELECT source, CAST(u % {m} AS INT) AS j,
             CASE WHEN u // {m} = 0 THEN {cap}
                  ELSE CAST(log2((u // {m}) & (-(u // {m}))) AS INT) + 1
             END AS rho FROM v),
    regs AS (SELECT source, {regs} FROM jr GROUP BY source)
    SELECT source, round({hll_estimate_sql(m)}, 6) AS distinct_est
    FROM regs
    """


# ---------------------------------------------------------------------------
# LSH tuning harness (pipeline/dedup.py:lsh_recall_eval)
# ---------------------------------------------------------------------------

def _q_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the 4-hash/2-band LSH against exact token-
    Jaccard ground truth at 0.8 on the same corpus — the (bands, rows)
    tuning signal (pipeline/dedup.py:lsh_recall_eval). The oracle
    nests the two existing pair oracles as scoped sub-WITH fragments
    and recomputes the three counts."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        lsh_recall_eval,
    )

    return lsh_recall_eval(
        _t(spark, sf_dir, "documents"), threshold=0.8,
        n_hashes=4, bands=2)


def _lsh_eval_sql() -> str:
    from neo4j_graph_algorithms_spark.pipeline.oracles import (
        pipeline_oracles,
    )

    orc = pipeline_oracles()
    truth = orc["token_jaccard_pairs"].strip()
    cand = orc["minhash_lsh_candidates"].strip()
    return f"""
    WITH truth AS ({truth}),
    cand AS ({cand}),
    hit AS (SELECT t.doc_a, t.doc_b FROM truth t
            JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
    n AS (SELECT (SELECT count(*) FROM truth) AS n_true,
                 (SELECT count(*) FROM cand) AS n_candidates,
                 (SELECT count(*) FROM hit) AS n_hit)
    SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_hit AS BIGINT) AS n_hit,
           CASE WHEN n_true = 0 THEN 1.0
                ELSE round(CAST(n_hit AS DOUBLE) / n_true, 6)
           END AS recall,
           CASE WHEN n_candidates = 0 THEN 1.0
                ELSE round(CAST(n_hit AS DOUBLE) / n_candidates, 6)
           END AS candidate_precision
    FROM n
    """


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus selection: A-ES top-50 by priority
    round(ln(u)/n_chars, 12), deterministic u from (doc_id, seed) —
    pipeline/sampling.py:weighted_sample_exact. 12-dp rounding grids
    both engines' ln kernels."""
    from neo4j_graph_algorithms_spark.pipeline.sampling import (
        weighted_sample_exact,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_exact(d, 50, weight_col="n_chars", seed=0)


_WEIGHTED_SAMPLE_SQL = f"""
    WITH p AS (SELECT doc_id, n_chars,
        round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                  || '#wsmp0'), 1, 15)) AS BIGINT) + 1)
                 / {float(1 << 60)!r})
              / CAST(n_chars AS DOUBLE), 12) AS pri
        FROM documents WHERE n_chars > 0),
    r AS (SELECT doc_id, n_chars,
                 row_number() OVER (ORDER BY pri DESC, doc_id) AS rk
          FROM p)
    SELECT doc_id, n_chars FROM r WHERE rk <= 50
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the sf0.001 link graph."""
    return _q_pagerank(spark, "/root/testdata/sf0.001")


# The driver oracle-checks only the FIRST 50 queries() entries, so this
# list is the round's curated proof window. Round-5 composition
# (VERDICT r4 next-round #1-#5):
# - the core-four anchors (pagerank/wcc/lpa/triangles);
# - the two r4 red rows, re-proven after their serialization fixes
#   (hyperball_anf: oracle SUM cast to BIGINT against DuckDB HUGEINT
#   widening; inverted_index: postings stringified on both engines);
# - the LAST 16 never-driver-checked entries — after this rotation
#   every oracle-backed registry entry has held a driver row;
# - the six entries NEW this round (streaming_cms — post-r4 frozen-
#   registry rule; image_features / audio_features / frame_sample —
#   the multimodal family's first driver rows; similarity_overlap and
#   relationship_writeback — first driver rows for SURVEY §2 #41 and
#   the #6/#8 write-back sinks, previously pytest-only) plus the two
#   whose code changed this round (warc_roundtrip octet_length,
#   quality_classifier trained-path keep);
# - 20 re-confirmation slots for prior-green entries (streaming folds,
#   sketches, invariant rows, walks, dedup) so regressions in the most
#   state-heavy paths surface in the driver artifact, not just pytest.
# Families whose every member is absent here are all driver-proven in a
# prior round's CORRECTNESS_r0{1,2,3,4}.json (pinned by
# tests/test_driver_window.py, which loads those artifacts).
_WINDOW = [
    # anchors
    "pagerank", "wcc", "label_propagation", "triangles_per_node",
    # r4 red rows, fixed this round
    "hyperball_anf", "inverted_index",
    # the last 16 never-driver-checked entries
    "ngram_jaccard_pairs", "label_propagation_seeded",
    "duplicate_span_scores", "repetition_scores", "tfidf_top_terms",
    "cooccurrence_pmi", "ngram_lm_score", "semantic_dedup",
    "simhash_near_dup", "embedding_near_dup", "vertex_cover",
    "greedy_coloring", "weighted_sample", "rewire_null_model",
    "events_latest", "containment_pairs",
    # new or changed this round
    "streaming_cms", "image_features", "audio_features", "frame_sample",
    "similarity_overlap", "relationship_writeback",
    "graph_catalog_projection", "algo_list",
    "warc_roundtrip", "quality_classifier",
    # re-confirmation of prior-green, state-heavy or recently-touched
    "hyperball_balls", "effective_diameter", "streaming_wcc",
    "streaming_near_dup", "streaming_url_dedup", "cms_heavy_hitters",
    "hll_source_distinct", "louvain_invariants", "infomap_invariants",
    "betweenness_sampled", "ensemble_dedup", "lsh_eval",
    "node2vec_pairs", "random_walks_weighted", "url_dedup",
    "canonical_urls",
    "triangles_sampled", "coarsen_matching",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is curated: the driver oracle-checks only the
    FIRST 50 entries, so positions 1-50 are the rotating proof window
    ``_WINDOW`` (see its comment for this round's composition). Tail
    entries (51+) remain fully covered by tests/test_oracle_parity.py,
    which replays ALL oracle-backed entries against DuckDB every
    pytest run, and everything green in a prior round's driver gate
    stays recorded in the committed CORRECTNESS_r0N.json artifacts."""
    all_q = {
        # ---- window 1-50: driver-checked this round -------------------
        "pagerank": _q_pagerank,
        "spam_mass": _q_spam_mass,
        "k_core": _q_kcore,
        "k_truss": _q_k_truss,
        "url_dedup": _q_url_dedup,
        "line_dedup": _q_line_dedup,
        "boilerplate_scores": _q_boilerplate_scores,
        "simrank": _q_simrank,
        "random_projection": _q_random_projection,
        "louvain_refined": _q_louvain_refined,
        "perplexity_buckets": _q_perplexity_buckets,
        "bpe_train": _q_bpe_train,
        "bpe_encode": _q_bpe_encode,
        "who_to_follow": _q_who_to_follow,
        "mirror_hosts": _q_mirror_hosts,
        "crawl_frontier": _q_crawl_frontier,
        "maximal_matching": _q_maximal_matching,
        "densest_subgraph": _q_densest_subgraph,
        "pages_pagerank_e2e": _q_pages_pagerank,
        "anchor_stats": _q_anchor_stats,
        "wcc": _q_wcc,
        "streaming_url_dedup": _q_streaming_url_dedup,
        "label_propagation": _q_lpa,
        "triangles_per_node": _q_triangles,
        "random_walks": _q_random_walks,
        "node2vec_pairs": _q_node2vec_pairs,
        "hits": _q_hits,
        "link_prediction": _q_linkprediction,
        "scalar_functions": _q_scalar_functions,
        "k_spanning_tree": _q_k_spanning_tree,
        "louvain_twolevel": _q_louvain_twolevel,
        "infomap_fixedmerges": _q_infomap_fixedmerges,
        "cocitation_pairs": _q_cocitation,
        "dedup_clusters": _q_dedup_clusters,
        "cosine_knn": _q_cosine_knn,
        "maximal_independent_set": _q_mis,
        "kmeans_clusters": _q_kmeans_clusters,
        "hyperball_balls": _q_hyperball,
        "bpe_token_stats": _q_bpe_token_stats,
        "vocab_top": _q_vocab,
        "resolve_redirects": _q_resolve_redirects,
        "graph_summary": _q_graph_summary,
        "c4_filter": _q_c4_filter,
        "decontaminate": _q_decontaminate,
        "sample_documents": _q_sample_documents,
        "mix_corpus": _q_mix_corpus,
        "pca_covariance": _q_pca_covariance,
        "ivf_knn": _q_ivf_knn,
        "pack_sequences": _q_pack_sequences,
        "events_window": _q_events_window,
        # ---- 51+: rotated out this round (r1/r2-green or rows-only;
        # all still replayed by test_oracle_parity every run) ----------
        "events_sessionize": _q_events_sessionize,
        "ngram_jaccard_pairs": _q_ngram3_jaccard,
        "inverted_index": _q_inverted_index,
        "greedy_coloring": _q_greedy_coloring,
        "pagerank_dangling": _q_pagerank_dangling,
        "powerlaw_fit": _q_powerlaw_fit,
        "diameter_sweep": _q_diameter_sweep,
        "random_walks_weighted": _q_random_walks_weighted,
        "coupling_pairs": _q_coupling,
        "community_compare": _q_community_compare,
        "degree_histogram": _q_degree_histogram,
        "temperature_mix": _q_temperature_mix,
        "spanning_tree": _q_spanning_tree,
        "pii_scrub": _q_pii_scrub,
        "pagerank_batch_ppr": _q_pagerank_batch_ppr,
        "shortest_path": _q_shortest_path,
        "betweenness": _q_betweenness,
        "betweenness_sampled": _q_betweenness_sampled,
        "minhash_lsh_candidates": _q_minhash_candidates,
        "streaming_near_dup": _q_streaming_near_dup,
        "pages_host_pagerank": _q_pages_host_pagerank,
        "pages_extract_edges": _q_extract_pages_edges,
        "euclidean_similarity": _q_euclidean_vectors,
        "token_jaccard_pairs": _q_ngram_jaccard,
        "minhash_signatures": _q_minhash_signatures,
        "simhash_signatures": _q_simhash,
        "wcc_incremental": _q_wcc_incremental,
        "pagerank_incremental": _q_pagerank_incremental,
        "hyperball_anf": _q_hyperball_anf,
        "effective_diameter": _q_effective_diameter,
        "pagerank_personalized": _q_pagerank_personalized,
        "pagerank_csr": _q_pagerank_csr,
        "pagerank_delta": _q_pagerank_delta,
        "pagerank_topk": _q_pagerank_topk,
        "pagerank_tolerance": _q_pagerank_tolerance,
        "pages_host_graph": _q_pages_host_graph,
        "wcc_threshold": _q_wcc_threshold,
        "wcc_stats": _q_wcc_stats,
        "triangle_list": _q_triangle_list,
        "triangles_incremental": _q_triangles_incremental,
        "clustering_coefficient": _q_lcc,
        "triangle_global": _q_triangle_global,
        "as_vector": _q_as_vector,
        "all_shortest_paths": _q_allsp,
        "astar_path": _q_astar,
        "infomap": _q_infomap,
        "infomap_invariants": _q_infomap_invariants,
        "articlerank": _q_articlerank,
        "eigenvector_l1norm": _q_eigenvector_l1,
        "degree_out": _q_degree("out", False),
        "degree_in_weighted": _q_degree("in", True),
        "jaccard_degree_cutoff": _q_jaccard_degree_cutoff,
        "closeness_wf": _q_closeness(True),
        "harmonic": _q_harmonic,
        "dangalchev": _q_dangalchev,
        "pearson_similarity": _q_pearson_vectors,
        "one_hot_lang": _q_onehot,
        "stratified_sample": _q_stratified_sample,
        "balanced_triads": _q_balanced_triads,
        "dfs_from_0": _q_dfs,
        "degree_in": _q_degree("in", False),
        "doc_fingerprints": _q_fingerprint,
        "token_stats": _q_token_stats,
        "pagerank_weighted": _q_pagerank_weighted,
        "bfs_from_0": _q_bfs,
        "scc": _q_scc,
        "k_shortest_paths": _q_kshortest,
        "closeness": _q_closeness(False),
        "lsh_sign_buckets": _q_lsh_buckets,
        "language_id": _q_langid,
        "exact_dedup": _q_exact_dedup,
        "jaccard_categories": _q_jaccard_categories,
        "similarity_overlap": _q_similarity_overlap,
        "relationship_writeback": _q_relationship_writeback,
        "graph_catalog_projection": _q_graph_catalog_projection,
        "algo_list": _q_algo_list,
        "sssp_from_0": _q_sssp,
        "eigenvector": _q_eigenvector,
        "louvain_onelevel": _q_louvain_onelevel,
        "quality_scores": _q_quality,
        "louvain": _q_louvain,
        "louvain_invariants": _q_louvain_invariants,
        "katz": _q_katz,
        "ppr_sweep_cut": _q_ppr_sweep_cut,
        "community_conductance": _q_community_conductance,
        "approx_eccentricity": _q_approx_eccentricity,
        "landmark_distances": _q_landmark_distances,
        "anti_trust_rank": _q_anti_trust_rank,
        "events_latest": _q_events_latest,
        "containment_pairs": _q_containment,
        "butterfly_count": _q_butterflies,
        "rewire_null_model": _q_rewire,
        "opic_importance": _q_opic,
        "bowtie_classes": _q_bowtie,
        "ensemble_dedup": _q_ensemble_dedup,
        "label_propagation_seeded": _q_lpa_seeded,
        "modularity": _q_modularity,
        "duplicate_span_scores": _q_duplicate_spans,
        "repetition_scores": _q_repetition,
        "tfidf_top_terms": _q_tfidf,
        "cooccurrence_pmi": _q_cooccurrence_pmi,
        "salsa": _q_salsa,
        "ngram_lm_score": _q_ngram_lm,
        "streaming_wcc": _q_streaming_wcc,
        "semantic_dedup": _q_semantic_dedup,
        "simhash_near_dup": _q_simhash_near_dup,
        "triangles_sampled": _q_triangles_sampled,
        "embedding_near_dup": _q_embedding_near_dup,
        "curation_e2e": _q_curation_e2e,
        "canonical_urls": _q_canonical_urls,
        "quality_classifier": _q_quality_classifier,
        "cms_heavy_hitters": _q_cms_heavy_hitters,
        "warc_roundtrip": _q_warc_roundtrip,
        "streaming_cms": _q_streaming_cms,
        "image_features": _q_image_features,
        "audio_features": _q_audio_features,
        "frame_sample": _q_frame_sample,
        "coarsen_matching": _q_coarsen_matching,
        "vertex_cover": _q_vertex_cover,
        "multilevel_bisect": _q_multilevel_bisect,
        "hll_source_distinct": _q_hll_source_distinct,
        "lsh_eval": _q_lsh_eval,
        "weighted_sample": _q_weighted_sample,
    }
    ordered = {k: all_q[k] for k in _WINDOW}
    ordered.update({k: v for k, v in all_q.items() if k not in ordered})
    return ordered


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    from neo4j_graph_algorithms_spark.pipeline.oracles import pipeline_oracles

    sql: dict[str, str] = {
        "pagerank": _pagerank_unrolled_sql(PR_ITERS, weighted=False),
        "pagerank_weighted": _pagerank_unrolled_sql(PR_ITERS, weighted=True),
        "pagerank_personalized": _ppr_unrolled_sql(PR_ITERS, list(range(10))),
        "pagerank_batch_ppr": _batch_ppr_unrolled_sql(PR_ITERS, BATCH_PPR_SETS),
        "katz": _katz_unrolled_sql(KATZ_ITERS, KATZ_ALPHA),
        "ppr_sweep_cut": _ppr_sweep_cut_sql(PR_ITERS, SWEEP_SEEDS),
        "community_conductance": _community_conductance_sql(4),
        "spam_mass": _spam_mass_sql(PR_ITERS, list(range(20))),
        # bucket = length(bin(deg))-1: exact binary digit count on both
        # engines (float log2 can land a hair under an integer)
        "degree_histogram": f"""
            WITH {_EDGES_CTE},
            od AS (SELECT src AS id, count(*) AS deg FROM edges
                   GROUP BY src),
            idg AS (SELECT dst AS id, count(*) AS deg FROM edges
                    GROUP BY dst),
            b AS (SELECT 'out' AS direction,
                         CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket
                  FROM od
                  UNION ALL
                  SELECT 'in', CAST(length(bin(deg)) - 1 AS BIGINT)
                  FROM idg)
            SELECT direction, bucket, count(*) AS n_nodes
            FROM b GROUP BY direction, bucket
        """,
        "graph_summary": f"""
            WITH {_EDGES_CTE},
            e AS (SELECT src, dst FROM edges WHERE src <> dst),
            n AS (SELECT count(*) AS n_edges FROM e),
            v AS (SELECT count(DISTINCT id) AS n_nodes FROM
                  (SELECT src AS id FROM e
                   UNION ALL SELECT dst FROM e)),
            r AS (SELECT count(*) AS n_recip FROM e a
                  WHERE EXISTS (SELECT 1 FROM e b
                                WHERE b.src = a.dst AND b.dst = a.src)),
            od AS (SELECT src, count(*) AS x FROM e GROUP BY src),
            idg AS (SELECT dst, count(*) AS y FROM e GROUP BY dst),
            s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                         CAST(sum(x) AS DOUBLE) AS sx,
                         CAST(sum(y) AS DOUBLE) AS sy,
                         CAST(sum(x * y) AS DOUBLE) AS sxy,
                         CAST(sum(x * x) AS DOUBLE) AS sxx,
                         CAST(sum(y * y) AS DOUBLE) AS syy
                  FROM e JOIN od USING (src) JOIN idg USING (dst))
            SELECT v.n_nodes, n.n_edges,
                   round(CAST(r.n_recip AS DOUBLE) / n.n_edges, 6)
                       AS reciprocity,
                   round((s.n * s.sxy - s.sx * s.sy)
                         / sqrt((s.n * s.sxx - s.sx * s.sx)
                                * (s.n * s.syy - s.sy * s.sy)), 6) + 0.0
                       AS assortativity
            FROM v CROSS JOIN n CROSS JOIN r CROSS JOIN s
        """,
        "triangle_list": f"""
            WITH {_EDGES_CTE}, {_CANON_CTE}, {_TRI_CTE}
            SELECT a AS node_a, b AS node_b, c AS node_c FROM tri
        """,
        "pagerank_csr": _pagerank_unrolled_sql(PR_ITERS, weighted=False),
        "pagerank_delta": _pagerank_unrolled_sql(PR_ITERS, weighted=False),
        "pagerank_incremental": _incremental_pagerank_sql(PR_ITERS),
        "pagerank_tolerance": _pagerank_tolerance_unrolled_sql(
            100, 1e-6, block=4),
        "pages_extract_edges": _pages_edges_sql(2000),
        "cocitation_pairs": _cocitation_sql(2000),
        "k_truss": _ktruss_unrolled_sql(5, 3),
        "densest_subgraph": _densest_unrolled_sql(8, 0.5),
        # NaN ordering note: BOTH engines treat NaN as equal-to-itself
        # and greater-than-everything, so abs(NaN) <> inf is true in
        # both — is_finite guards with isnan first, replayed verbatim
        "scalar_functions": """
            WITH t AS (SELECT doc_id, lang,
                              CASE CAST(doc_id % 5 AS INT)
                                   WHEN 0 THEN CAST('infinity' AS DOUBLE)
                                   WHEN 1 THEN CAST('-infinity' AS DOUBLE)
                                   WHEN 2 THEN CAST('nan' AS DOUBLE)
                                   ELSE CAST(n_chars AS DOUBLE) / 7.0
                              END AS x
                       FROM documents)
            SELECT doc_id,
                   (NOT isnan(x)) AND abs(x) <> CAST('infinity' AS DOUBLE)
                       AS finite,
                   abs(x) = CAST('infinity' AS DOUBLE) AS infinite,
                   array_to_string(list_transform(
                       ['de', 'en', 'es', 'fr', 'zh'],
                       l -> CASE WHEN l = lang THEN '1' ELSE '0' END), '')
                       AS one_hot
            FROM t
        """,
        "anchor_stats": _anchor_stats_sql(2000),
        "pages_host_graph": (
            "WITH " + ",\n".join(_host_rollup_parts(
                _HOST_N_PAGES, _HOST_N_HOSTS))
            + "\nSELECT src_host, dst_host, weight FROM hw"
        ),
        "pages_host_pagerank": _host_pagerank_sql(
            _HOST_N_PAGES, _HOST_N_HOSTS, _HOST_PR_ITERS),
        "pages_pagerank_e2e": _pages_pagerank_sql(2000, 50, 1e-6, block=4),
        "pagerank_topk": (
            _pagerank_unrolled_sql(PR_ITERS, weighted=False)
            + " ORDER BY rank DESC, id ASC LIMIT 20"
        ),
        "bfs_from_0": f"""
            WITH RECURSIVE {_EDGES_CTE},
            r(id, d) AS (
              SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
              UNION
              SELECT e.dst, r.d + 1 FROM r JOIN edges e ON e.src = r.id
              WHERE r.d < 20
            )
            SELECT id, min(d) AS distance FROM r GROUP BY id
        """,
        "articlerank": _articlerank_unrolled_sql(PR_ITERS),
        "eigenvector": _eigenvector_unrolled_sql(PR_ITERS),
        "hits": _hits_unrolled_sql(PR_ITERS),
        "salsa": _salsa_unrolled_sql(PR_ITERS),
        "eigenvector_l1norm": _eigenvector_unrolled_sql(PR_ITERS, "l1norm"),
        "sssp_from_0": _sssp_unrolled_sql(20),
        "shortest_path": _shortest_path_oracle_sql(20),
        "louvain_onelevel": _louvain_onelevel_sql(4),
        "infomap_fixedmerges": _infomap_fixedmerges_sql(8),
        "louvain_twolevel": _louvain_twolevel_sql(4, 4),
        "louvain_invariants": _louvain_invariants_oracle_sql(2),
        "infomap_invariants": _infomap_invariants_oracle_sql(),
        "warc_roundtrip": _WARC_ROUNDTRIP_SQL,
        "streaming_cms": _streaming_cms_sql(depth=4, width=1024),
        "image_features": _IMAGE_FEATURES_SQL,
        "audio_features": _AUDIO_FEATURES_SQL,
        "frame_sample": _FRAME_SAMPLE_SQL,
        "quality_classifier": _quality_classifier_sql(),
        "cms_heavy_hitters": _cms_heavy_hitters_sql(),
        "random_walks": _random_walks_oracle_sql(),
        "node2vec_pairs": _node2vec_pairs_oracle_sql(2),
        "hyperball_balls": (
            "SELECT id, r, CAST(ROUND(ball_est * 1e6) AS BIGINT) AS "
            f"ball_micro FROM ({_hyperball_oracle_sql(radius=3, b=4)})"),
        "hyperball_anf": _hyperball_anf_oracle_sql(radius=3, b=4),
        "effective_diameter": _effective_diameter_oracle_sql(radius=3, b=4),
        "approx_eccentricity": _hyperball_oracle_sql(
            radius=3, b=4, final_select=_ECC_FINAL_SELECT),
        "landmark_distances": _landmark_distances_sql(
            LANDMARKS, LANDMARK_DEPTH),
        "anti_trust_rank": _batch_ppr_unrolled_sql(
            PR_ITERS, [ANTI_TRUST_SEEDS], reverse=True,
            final_select=f"SELECT id, round(r0, 6) AS anti_trust "
                         f"FROM r{PR_ITERS}"),
        "events_latest": """
            SELECT user_id, event_id, event_type,
                   round(value, 6) AS value
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "k_shortest_paths": _ksp_oracle_sql(),
        "all_shortest_paths": _allsp_unrolled_sql(20),
        "astar_path": _astar_oracle_sql(),
        "as_vector": f"""
            WITH {_WEDGES_CTE},
            p AS (SELECT src AS id, dst AS item, weight FROM wedges
                  WHERE src < 100)
            SELECT id,
                   CAST(row_number() OVER (PARTITION BY id ORDER BY item) - 1
                        AS INT) AS pos,
                   item, round(weight, 6) AS weight
            FROM p
        """,
        "closeness": _closeness_sql(False),
        "closeness_wf": _closeness_sql(True),
        "harmonic": _HARMONIC_SQL,
        "dangalchev": _DANGALCHEV_SQL,
        "betweenness": _betweenness_oracle_sql(),
        "betweenness_sampled": _betweenness_sampled_oracle_sql(),
        "spanning_tree": _spanning_oracle_sql(),
        "k_spanning_tree": _k_spanning_oracle_sql(5),
        "scc": _SCC_SQL,
        "balanced_triads": _BALANCED_SQL,
        "euclidean_similarity": _EUCLIDEAN_SQL,
        "pearson_similarity": _PEARSON_SQL,
        "wcc": _WCC_SQL,
        "streaming_wcc": _WCC_SQL,
        "k_core": _kcore_oracle_sql(3, 8),
        "maximal_independent_set": _mis_oracle_sql(8, 42),
        "resolve_redirects": _redirects_oracle_sql(6),
        "greedy_coloring": _coloring_oracle_sql(4, 4, 42, 200),
        "pagerank_dangling": _pagerank_dangling_unrolled_sql(PR_ITERS),
        "powerlaw_fit": _POWERLAW_SQL,
        "diameter_sweep": _DIAMETER_SWEEP_SQL,
        "random_walks_weighted": _random_walks_weighted_oracle_sql(),
        "coupling_pairs": _coupling_sql(2000),
        "butterfly_count": _butterflies_sql(2000),
        "rewire_null_model": _rewire_sql(REWIRE_SEED),
        "opic_importance": _opic_unrolled_sql(OPIC_STEPS),
        "bowtie_classes": _bowtie_sql(300),
        "community_compare": _COMMUNITY_COMPARE_SQL,
        "wcc_stats": _WCC_STATS_SQL,
        "wcc_incremental": _WCC_SQL,
        "triangles_incremental": f"""
            WITH {_EDGES_CTE}, {_NODES_CTE}, {_CANON_CTE}, {_TRI_PER_NODE_CTE}
            SELECT n.id, coalesce(p.triangles, 0) AS triangles
            FROM nodes n LEFT JOIN pern p ON n.id = p.id
        """,
        "wcc_threshold": _WCC_TH_SQL,
        "label_propagation": _lpa_unrolled_sql(LPA_ITERS),
        "label_propagation_seeded": _lpa_seeded_unrolled_sql(LPA_ITERS),
        "modularity": f"""
            WITH {_EDGES_CTE}, {_NODES_CTE},
            sym AS (SELECT src, dst, CAST(sum(w) AS DOUBLE) AS weight FROM (
                SELECT src, dst, 1.0 AS w FROM edges UNION ALL
                SELECT dst AS src, src AS dst, 1.0 AS w FROM edges
                WHERE src <> dst) GROUP BY src, dst),
            lab AS (SELECT id, id % 4 AS c FROM nodes),
            ej AS (SELECT s.src, s.dst, s.weight, la.c AS cs, lb.c AS cd
                   FROM sym s JOIN lab la ON la.id = s.src
                              JOIN lab lb ON lb.id = s.dst),
            m2 AS (SELECT sum(CASE WHEN src = dst THEN 2.0 * weight
                                   ELSE weight END) AS v FROM ej),
            per AS (SELECT cs,
                           sum(CASE WHEN cs = cd THEN
                                 CASE WHEN src = dst THEN 2.0 * weight
                                      ELSE weight END ELSE 0.0 END) AS in_c,
                           sum(CASE WHEN src = dst THEN 2.0 * weight
                                    ELSE weight END) AS tot_c
                    FROM ej GROUP BY cs)
            SELECT round(sum(in_c / (SELECT v FROM m2)
                   - (tot_c / (SELECT v FROM m2))
                     * (tot_c / (SELECT v FROM m2))), 6) + 0.0 AS modularity
            FROM per
        """,
        "triangles_sampled": f"""
            WITH {_EDGES_CTE}, {_NODES_CTE}, {_CANON_CTE}, {_SCANON_CTE},
            {_STRI_CTE},
            corners AS (SELECT a AS id FROM stri UNION ALL
                        SELECT b FROM stri UNION ALL SELECT c FROM stri),
            pern AS (SELECT id, count(*) AS triangles FROM corners GROUP BY id),
            sdeg AS (SELECT id, count(*) AS deg FROM
                     (SELECT lo AS id FROM scanon UNION ALL SELECT hi FROM scanon)
                     GROUP BY id)
            SELECT n.id,
                   round(CAST(coalesce(p.triangles, 0) AS DOUBLE) * 8.0, 6)
                       AS triangles_est,
                   round(CASE WHEN coalesce(d.deg, 0) >= 2
                         THEN 2.0 * coalesce(p.triangles, 0) / (d.deg * (d.deg - 1))
                         ELSE 0.0 END, 6) AS coefficient
            FROM nodes n
            LEFT JOIN sdeg d ON n.id = d.id
            LEFT JOIN pern p ON n.id = p.id
        """,
        "triangles_per_node": f"""
            WITH {_EDGES_CTE}, {_NODES_CTE}, {_CANON_CTE}, {_TRI_PER_NODE_CTE}
            SELECT n.id, coalesce(p.triangles, 0) AS triangles
            FROM nodes n LEFT JOIN pern p ON n.id = p.id
        """,
        "clustering_coefficient": f"""
            WITH {_EDGES_CTE}, {_NODES_CTE}, {_CANON_CTE}, {_UND_DEG_CTE},
                 {_TRI_PER_NODE_CTE}
            SELECT n.id,
                   round(CASE WHEN coalesce(d.deg, 0) >= 2
                         THEN 2.0 * coalesce(p.triangles, 0) / (d.deg * (d.deg - 1))
                         ELSE 0.0 END, 6) AS coefficient
            FROM nodes n
            LEFT JOIN udeg d ON n.id = d.id
            LEFT JOIN pern p ON n.id = p.id
        """,
        "triangle_global": f"""
            WITH {_EDGES_CTE}, {_NODES_CTE}, {_CANON_CTE}, {_UND_DEG_CTE},
                 {_TRI_PER_NODE_CTE},
            coef AS (
              SELECT n.id,
                     CASE WHEN coalesce(d.deg, 0) >= 2
                          THEN 2.0 * coalesce(p.triangles, 0) / (d.deg * (d.deg - 1))
                          ELSE 0.0 END AS c
              FROM nodes n
              LEFT JOIN udeg d ON n.id = d.id
              LEFT JOIN pern p ON n.id = p.id)
            SELECT (SELECT count(*) FROM tri) AS triangles,
                   round((SELECT avg(c) FROM coef), 6) AS avg_coefficient
        """,
        "degree_in": f"""
            WITH {_EDGES_CTE}, {_NODES_CTE},
            d AS (SELECT dst AS id, CAST(count(*) AS DOUBLE) AS s FROM edges GROUP BY dst)
            SELECT n.id, round(coalesce(d.s, 0.0), 6) AS score
            FROM nodes n LEFT JOIN d ON n.id = d.id
        """,
        "degree_out": f"""
            WITH {_EDGES_CTE}, {_NODES_CTE},
            d AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS s FROM edges GROUP BY src)
            SELECT n.id, round(coalesce(d.s, 0.0), 6) AS score
            FROM nodes n LEFT JOIN d ON n.id = d.id
        """,
        "degree_in_weighted": f"""
            WITH {_WEDGES_CTE},
            nodes AS (SELECT DISTINCT id FROM
              (SELECT src AS id FROM wedges UNION ALL SELECT dst FROM wedges)),
            d AS (SELECT dst AS id, sum(weight) AS s FROM wedges
                  WHERE weight > 0 GROUP BY dst)
            SELECT n.id, round(coalesce(d.s, 0.0), 6) AS score
            FROM nodes n LEFT JOIN d ON n.id = d.id
        """,
        "link_prediction": f"""
            WITH {_EDGES_CTE}, {_CANON_CTE}, {_NBRS_CTE}, {_UND_DEG_CTE},
            pairs AS (SELECT lo AS u, hi AS v FROM canon WHERE lo < 100),
            common AS (
              SELECT p.u, p.v, a.nbr AS w
              FROM pairs p
              JOIN nbrs a ON a.id = p.u
              JOIN nbrs b ON b.id = p.v AND b.nbr = a.nbr
            ),
            cn AS (SELECT u, v, count(*) AS common_neighbors,
                          sum(1.0 / ln(d.deg)) AS aa,
                          sum(1.0 / d.deg) AS ra
                   FROM common JOIN udeg d ON d.id = common.w
                   GROUP BY u, v)
            SELECT p.u, p.v,
                   coalesce(cn.common_neighbors, 0) AS common_neighbors,
                   round(coalesce(cn.aa, 0.0), 6) AS adamic_adar,
                   round(coalesce(cn.ra, 0.0), 6) AS resource_allocation,
                   du.deg * dv.deg AS preferential_attachment,
                   du.deg + dv.deg - coalesce(cn.common_neighbors, 0) AS total_neighbors,
                   CAST(CASE WHEN p.u % 3 <> 0 AND p.v % 3 <> 0
                             AND p.u % 7 = p.v % 7
                        THEN 1.0 ELSE 0.0 END AS DOUBLE) AS same_community
            FROM pairs p
            JOIN udeg du ON du.id = p.u
            JOIN udeg dv ON dv.id = p.v
            LEFT JOIN cn ON cn.u = p.u AND cn.v = p.v
        """,
        "jaccard_categories": f"""
            WITH {_EDGES_CTE},
            cats AS (SELECT DISTINCT src AS item, dst AS cat FROM edges WHERE src < 60),
            sizes AS (SELECT item, count(*) AS n FROM cats GROUP BY item),
            inter AS (SELECT a.item AS item1, b.item AS item2, count(*) AS i
                      FROM cats a JOIN cats b ON a.cat = b.cat AND a.item < b.item
                      GROUP BY a.item, b.item),
            sim AS (SELECT i.item1, i.item2,
                           CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS similarity
                    FROM inter i
                    JOIN sizes sa ON sa.item = i.item1
                    JOIN sizes sb ON sb.item = i.item2)
            SELECT item1, item2, round(similarity, 6) AS similarity
            FROM sim WHERE similarity >= 0.05
        """,
        "algo_list": _algo_list_sql(),
        "graph_catalog_projection": f"""
            WITH {_EDGES_CTE},
            v AS (SELECT DISTINCT id FROM
                  (SELECT src AS id FROM edges
                   UNION ALL SELECT dst FROM edges)),
            vf AS (SELECT id FROM v WHERE id % 3 <> 2),
            ef AS (SELECT src, dst FROM edges
                   WHERE (src + dst) % 2 = 0
                     AND src IN (SELECT id FROM vf)
                     AND dst IN (SELECT id FROM vf)),
            deg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS degree
                    FROM ef GROUP BY src)
            SELECT d.id, d.degree,
                   CAST((SELECT count(*) FROM vf) AS BIGINT) AS n_nodes,
                   CAST((SELECT count(*) FROM ef) AS BIGINT) AS n_edges
            FROM deg d
        """,
        "similarity_overlap": f"""
            WITH {_EDGES_CTE},
            cats AS (SELECT DISTINCT src AS item, dst AS cat FROM edges WHERE src < 60),
            sizes AS (SELECT item, count(*) AS n FROM cats GROUP BY item),
            inter AS (SELECT a.item AS item1, b.item AS item2, count(*) AS i
                      FROM cats a JOIN cats b ON a.cat = b.cat AND a.item < b.item
                      GROUP BY a.item, b.item),
            sim AS (SELECT i.item1, i.item2,
                           CAST(i.i AS DOUBLE) / least(sa.n, sb.n) AS similarity
                    FROM inter i
                    JOIN sizes sa ON sa.item = i.item1
                    JOIN sizes sb ON sb.item = i.item2)
            SELECT item1, item2, round(similarity, 6) AS similarity
            FROM sim WHERE similarity >= 0.25
        """,
        "relationship_writeback": f"""
            WITH {_EDGES_CTE},
            cats AS (SELECT DISTINCT src AS item, dst AS cat FROM edges WHERE src < 60),
            sizes AS (SELECT item, count(*) AS n FROM cats GROUP BY item),
            inter AS (SELECT a.item AS item1, b.item AS item2, count(*) AS i
                      FROM cats a JOIN cats b ON a.cat = b.cat AND a.item < b.item
                      GROUP BY a.item, b.item),
            sim AS (SELECT i.item1, i.item2,
                           CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS similarity
                    FROM inter i
                    JOIN sizes sa ON sa.item = i.item1
                    JOIN sizes sb ON sb.item = i.item2)
            SELECT item1 AS src, item2 AS dst, 'SIMILAR' AS rel_type,
                   round(similarity, 6) AS similarity
            FROM sim WHERE similarity >= 0.05
        """,
        "jaccard_degree_cutoff": f"""
            WITH {_EDGES_CTE},
            cats AS (SELECT DISTINCT src AS item, dst AS cat FROM edges WHERE src < 60),
            sizes AS (SELECT item, count(*) AS n FROM cats GROUP BY item),
            inter AS (SELECT a.item AS item1, b.item AS item2, count(*) AS i
                      FROM cats a JOIN cats b ON a.cat = b.cat AND a.item < b.item
                      GROUP BY a.item, b.item),
            sim AS (SELECT i.item1, i.item2,
                           CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS similarity
                    FROM inter i
                    JOIN sizes sa ON sa.item = i.item1
                    JOIN sizes sb ON sb.item = i.item2
                    WHERE sa.n >= 3 AND sb.n >= 3)
            SELECT item1, item2, round(similarity, 6) AS similarity
            FROM sim WHERE similarity >= 0.05
        """,
        "events_window": """
            SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS win, event_type,
                   count(*) AS n, round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_sessionize": """
            WITH g AS (
              SELECT user_id,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             IS NULL
                     THEN 1 ELSE 0 END AS new_sess
              FROM events)
            SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions
            FROM g GROUP BY user_id
        """,
    }
    # DFS visit order is sequential, but the walk is deterministic
    # (visited-at-push, ascending-adjacency addFirst ≡ largest unvisited
    # neighbor popped first), so a single-row stack machine in a
    # recursive CTE replays it exactly: each iteration pops stack[1],
    # appends it to the preorder, and pushes the still-unvisited
    # neighbors (reversed, so the largest lands on top).  adj is
    # MATERIALIZED — the recursive term re-reads it every iteration.
    sql["dfs_from_0"] = f"""
        WITH RECURSIVE
        edges AS MATERIALIZED (
          SELECT DISTINCT l_orderkey % {N_MOD} AS src,
                          l_partkey % {N_MOD} AS dst FROM lineitem),
        adj AS MATERIALIZED (
          SELECT src, list(dst ORDER BY dst) AS nbrs
          FROM edges WHERE src < {SUB_N} AND dst < {SUB_N} GROUP BY src),
        walk AS (
          SELECT [CAST(0 AS BIGINT)] AS stack, [CAST(0 AS BIGINT)] AS visited,
                 CAST([] AS BIGINT[]) AS ord
          UNION ALL
          SELECT list_concat(list_reverse(fresh), stack[2:]) AS stack,
                 list_concat(visited, fresh) AS visited,
                 list_append(ord, v) AS ord
          FROM (
            SELECT stack, visited, ord, stack[1] AS v,
                   list_filter(coalesce(a.nbrs, CAST([] AS BIGINT[])),
                               x -> NOT list_contains(visited, x)) AS fresh
            FROM walk LEFT JOIN adj a ON a.src = stack[1]
            WHERE len(stack) > 0)
        ),
        fin AS (SELECT ord FROM walk ORDER BY len(ord) DESC LIMIT 1)
        SELECT CAST(unnest(range(len(ord))) AS INT) AS step,
               CAST(unnest(ord) AS BIGINT) AS id
        FROM fin
    """
    sql.update(pipeline_oracles())
    sql["canonical_urls"] = _canonical_urls_sql()
    sql["url_dedup"] = _url_dedup_sql()
    sql["line_dedup"] = _line_dedup_sql()
    sql["boilerplate_scores"] = _boilerplate_sql()
    sql["simrank"] = _simrank_unrolled_sql(3, 0.8, 40)
    sql["random_projection"] = _random_projection_sql(64, 8, 42)
    sql["louvain_refined"] = _louvain_refined_sql(4)
    sql["perplexity_buckets"] = _PERPLEXITY_BUCKETS_SQL
    sql["streaming_url_dedup"] = _url_dedup_sql()
    sql["bpe_train"] = _bpe_train_sql(6)
    sql["who_to_follow"] = _wtf_sql(8, 8, 0, 20, 10)
    sql["bpe_encode"] = _bpe_encode_sql(6)
    sql["mirror_hosts"] = _MIRROR_HOSTS_SQL
    sql["crawl_frontier"] = _crawl_frontier_sql(2000, 8, 1500)
    sql["maximal_matching"] = _matching_unrolled_sql(6, 42)
    sql["coarsen_matching"] = _coarsen_matching_sql(6, 42)
    sql["vertex_cover"] = _vertex_cover_sql(6, 42)
    sql["multilevel_bisect"] = _bisect_sql(2, 6, 42)
    sql["hll_source_distinct"] = _hll_source_distinct_sql(6)
    sql["lsh_eval"] = _lsh_eval_sql()
    sql["weighted_sample"] = _WEIGHTED_SAMPLE_SQL
    # intentionally no oracle (data-dependent iteration counts over
    # non-deterministic tie-broken moves): infomap, louvain
    # → driver records rows-only checks
    return sql
