#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric mirrors BASELINE.json: edges processed/sec per
PageRank superstep to 1e-6 convergence over the deduplicated edge table
extracted from the synthetic Common-Crawl-style pages table. Additional
per-query timings cover the other core algorithms over the same graph
plus the TPC-H-derived graph queries.

Scaling protocol (BASELINE.md §3): run
  SPARK_GRAFT_CPUS=8  python bench.py --scaling
  → reports throughput at local[8] and local[32] + efficiency.
(bench.py --scaling spawns both runs itself.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# pages count scales with the sf dir's lineitem size ordering; default
# sized so the pages graph is the dominant workload at sf0.1
N_PAGES = int(os.environ.get("BENCH_PAGES", "200000"))
PR_TOL = 1e-6


def _spark():
    from neo4j_graph_algorithms_spark.session import get_spark

    return get_spark(
        app_name="nga-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _timed(fn, label: str = ""):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    if label:
        _log(f"{label}: {dt:.1f}s")
    return dt, out


def _build_pages_graph(spark):
    """pages → extracted, deduplicated, id-mapped edge table (persisted)."""
    from pyspark.sql import functions as F
    from neo4j_graph_algorithms_spark.sources import extract_edges, generate_pages
    from neo4j_graph_algorithms_spark.graph import id_map

    pages = generate_pages(spark, N_PAGES)
    raw = extract_edges(pages, dedup=True).persist()
    raw.count()  # materialize: id_map + the two joins below all read it
    ids = id_map(
        raw.select(F.col("src_url").alias("src"), F.col("dst_url").alias("dst")),
        node_col="url",
    ).persist()
    e = (
        raw.join(ids.withColumnRenamed("url", "src_url"), "src_url")
        .withColumnRenamed("id", "src")
        .join(ids.withColumnRenamed("url", "dst_url"), "dst_url")
        .withColumnRenamed("id", "dst")
        .select("src", "dst")
        .persist()
    )
    v = ids.select("id").persist()
    n_edges = e.count()
    n_nodes = v.count()
    return v, e, n_nodes, n_edges


def run_bench() -> dict:
    from pyspark.sql import functions as F
    from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
    from neo4j_graph_algorithms_spark.operators.wcc import connected_components
    from neo4j_graph_algorithms_spark.operators.labelprop import label_propagation
    from neo4j_graph_algorithms_spark.operators.triangles import triangle_count

    spark = _spark()
    queries: dict[str, float] = {}

    _log(f"building pages graph: n={N_PAGES} cpus={CPUS}")
    t_build, (v, e, n_nodes, n_edges) = _timed(
        lambda: _build_pages_graph(spark), "pages_extract_build")
    _log(f"graph: {n_nodes} nodes, {n_edges} edges")
    queries["pages_extract_build"] = round(t_build, 3)

    # headline: PageRank to 1e-6 convergence
    t0 = time.time()
    res = pagerank(v, e, max_iterations=150, tol=PR_TOL, unroll=8)
    t_pr = time.time() - t0
    supersteps = res.iterations
    _log(f"pagerank_conv: {t_pr:.1f}s, {supersteps} supersteps, "
         f"converged={res.converged}")
    queries["pagerank_conv"] = round(t_pr, 3)
    edges_per_sec_per_superstep = n_edges * supersteps / t_pr

    t, wres = _timed(lambda: connected_components(v, e), "wcc")
    queries["wcc"] = round(t, 3)
    t, _ = _timed(
        lambda: label_propagation(v, e, max_iterations=5, partition_col=None,
                                  node_weight_col=None),
        "label_propagation_5",
    )
    queries["label_propagation_5"] = round(t, 3)
    t, tres = _timed(lambda: triangle_count(v, e), "triangle_count")
    queries["triangle_count"] = round(t, 3)

    # TPC-H-derived graph (the oracle-checked graph) for cross-reference
    import __spark_entry__ as em

    for name in ["pagerank", "wcc", "triangles_per_node"]:
        t, _ = _timed(lambda: em.queries()[name](spark, SF_DIR).count(),
                      f"tpch_{name}")
        queries[f"tpch_{name}"] = round(t, 3)

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "edges_per_sec_per_pagerank_superstep_tol1e-6",
        "value": round(edges_per_sec_per_superstep, 1),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "total_sec": total,
        "graph": {"nodes": n_nodes, "edges": n_edges,
                  "pagerank_supersteps": supersteps,
                  "pagerank_converged": res.converged,
                  "max_delta": res.max_delta},
        "cpus": CPUS,
    }
    spark.stop()
    return result


def run_scaling() -> None:
    """Two-parallelism-level evidence for the N vs 4N criterion."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True, text=True,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["value"]
    thr32 = results[32]["value"]
    eff = (thr32 / thr8) / 4.0
    print(json.dumps({
        "scaling": {
            "throughput_local8": thr8,
            "throughput_local32": thr32,
            "efficiency": round(eff, 4),
            "criterion": "efficiency >= 0.8 between N and 4N cores",
            "runs": results,
        }
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
