"""Capture the physical plans of representative queries into PLANS.md.

"After each operator works, explain('formatted') the plan and iterate"
— this tool makes that audit a checked-in artifact: for each listed
query it renders the final DataFrame's formatted physical plan (plans
are data-size-independent in shape; sf0.001 keeps the run fast) plus a
pointer at the load-bearing plan features a reviewer should verify
(pushdown, broadcast choices, codegen spans, absence of vertex-scale
single-partition stages).

Usage:  python tools/plan_audit.py          # writes PLANS.md
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
MAX_LINES = 110

# query -> what to look for in its plan
AUDIT = {
    "pagerank": (
        "The tolerance loop itself runs per-superstep jobs; this final "
        "plan shows the converged ranks' lineage tail: the vertex-sized "
        "state reads back from the loop's localCheckpoint/cache (no "
        "edge-table rescan at the consumer), and the parquet scan that "
        "IS present prunes to the two edge columns (ReadSchema)."),
    "pages_extract_edges": (
        "Arrow extraction pipeline: one Scan -> ArrowEvalPython -> "
        "project/explode chain, dedup aggregation after; no per-row "
        "Python, no extra exchanges before the dedup shuffle."),
    "triangles_per_node": (
        "Degree-oriented compact-forward: oriented edge build, "
        "self-joins keyed on the oriented endpoints, "
        "whole-stage-codegen around the count aggregations; no "
        "cartesian anywhere."),
    "minhash_lsh_candidates": (
        "ONE equality self-join on (band, bkey) postings regardless of "
        "band count — look for exactly one join of the posting subtree "
        "with itself, fed by the single signature aggregation via "
        "localCheckpoint (no recompute per side)."),
    "ppr_sweep_cut": (
        "Sweep ranking comes from RangePartitioning exchanges + "
        "per-partition windows — there must be NO SinglePartition "
        "exchange anywhere (the vertex-scale sweep would serialize); "
        "cut events join the support-sized rank table, then the second "
        "range-partitioned prefix sum."),
    "tfidf_top_terms": (
        "Inverted-index build: token explode, two hash aggregations "
        "(df + tf), broadcast of the model-sized vocabulary side."),
    "rewire_null_model": (
        "Two independent md5 stub rankings (RangePartitioning + "
        "partition-local window each) re-paired by a rank equi-join; "
        "again no SinglePartition exchange."),
    "url_dedup": (
        "ONE hash-partitioned exchange: partial max_by/count aggregate "
        "below it (map-side combine), final above; no Window, no Join, "
        "no Python — the canonicalization is a codegen'd projection."),
    "line_dedup": (
        "Winner rule as min-struct aggregation + join back (NO "
        "row_number window over a global sort); re-assembly is an "
        "array_sort inside the doc-keyed aggregate."),
    "random_projection": (
        "Map-only: the ±1 matrix is plan constants inside a "
        "zip_with/aggregate fold — expect zero Exchange nodes and no "
        "Python eval."),
    "simrank": (
        "Pair-lattice superstep tail: two edge equi-joins + one "
        "pair-keyed aggregation reading the per-step localCheckpoint; "
        "no vertex-scale single-partition stage."),
    "who_to_follow": (
        "Composition tail: circle (LIMIT k) broadcast to induce the "
        "bipartite edges, SALSA state vertex-sized, followed-set "
        "anti-join broadcast; the only big-side scans are the edge "
        "table reads."),
    "hll_source_distinct": (
        "Sketch build: ONE hash aggregation with m=64 partial-max "
        "register columns (map-side combine, no explode); the estimate "
        "is a map-only expression over the registers."),
    "perplexity_buckets": (
        "Model-sized percentile aggregation (state bounded by distinct "
        "6-dp scores) + ONE broadcast join labeling every document — "
        "no per-language window sort."),
    "random_walks_weighted": (
        "r4 packed-interval rewrite: each step is a single-key equi-"
        "join against the one-row-per-node packed adjacency (look for "
        "the collect_list/aggregate fold building _dsts/_cums and "
        "element_at picks); NO Window and NO per-candidate-edge join "
        "anywhere in the step chain — a degree-10^6 hub is one wide "
        "row, not 10^6 shuffled rows."),
    "node2vec_pairs": (
        "r4 packed second-order step: two vertex-keyed equi-joins "
        "(current node's _dsts + prev's _pnbrs), bias/cumulative/pick "
        "in-row via higher-order functions; NO Window over candidate "
        "rows. The skip-gram pair expansion downstream is the in-row "
        "nested-transform shape with one pair-keyed count aggregation."),
    "betweenness_sampled": (
        "Degree-proportional RA-Brandes: selection is a codegen'd "
        "integer-hash filter over the degree aggregate (no sampling "
        "exchange), sources flow into mapInPandas over the CSR "
        "artifact, one final per-node sum aggregation; the only "
        "Python in the plan is the Arrow-batched Brandes kernel."),
    "warc_roundtrip": (
        "binaryFile scan of the synthesized segment -> ONE mapInPandas "
        "(Arrow) parse -> codegen'd projection (md5/length); no per-"
        "row Python, no exchange before the final projection."),
}


def main() -> None:
    import __spark_entry__ as em
    from neo4j_graph_algorithms_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[8]",
                      shuffle_partitions=8)
    qs = em.queries()
    out = [
        "# PLANS — physical-plan audit of representative queries",
        "",
        f"Generated by `python tools/plan_audit.py` at {SF_DIR} "
        "(plan SHAPE is what matters; sizes are the small test scale).",
        "Each section: what to verify, then `explain('formatted')` "
        f"output (truncated to {MAX_LINES} lines).",
        "",
    ]
    for name, note in AUDIT.items():
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        lines = plan.splitlines()
        body = lines[:MAX_LINES]
        trunc = (f"\n... ({len(lines) - MAX_LINES} more lines)"
                 if len(lines) > MAX_LINES else "")
        out += [f"## {name}", "", note, "", "```",
                *body, f"```{trunc}", ""]
        single = "SinglePartition" in plan
        print(f"[plan-audit] {name}: {len(lines)} plan lines, "
              f"single_partition={single}")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print("[plan-audit] wrote PLANS.md")


if __name__ == "__main__":
    main()
