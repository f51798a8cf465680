"""degree_histogram / graph_summary: python-replay parity on a
hand-built graph with known reciprocity/assortativity."""

import math
from collections import Counter

import pytest

from neo4j_graph_algorithms_spark.operators.graphstats import (
    degree_histogram, graph_summary,
)

# 0↔1 reciprocal pair, 2→{0,1,3}, 3→3 self-loop (dropped), dup edge
EDGES = [(0, 1), (1, 0), (2, 0), (2, 1), (2, 3), (3, 3), (2, 0)]


def _e(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_degree_histogram(spark):
    got = {(r["direction"], r["bucket"]): r["n_nodes"]
           for r in degree_histogram(_e(spark)).collect()}
    # histogram operates on the RAW edge list (incl. dup + self-loop)
    outd = Counter(s for s, _ in EDGES)
    ind = Counter(d for _, d in EDGES)
    exp = Counter()
    for c in outd.values():
        exp[("out", int(math.floor(math.log2(c))))] += 1
    for c in ind.values():
        exp[("in", int(math.floor(math.log2(c))))] += 1
    assert got == dict(exp)


def test_graph_summary_known_values(spark):
    row = graph_summary(_e(spark)).collect()[0]
    # dedup + drop self-loop: 0→1, 1→0, 2→0, 2→1, 2→3 (5 edges)
    assert row["n_nodes"] == 4 and row["n_edges"] == 5
    assert row["reciprocity"] == pytest.approx(2 / 5)
    # assortativity replay: x=outdeg(src), y=indeg(dst) per edge
    edges = [(0, 1), (1, 0), (2, 0), (2, 1), (2, 3)]
    outd = Counter(s for s, _ in edges)
    ind = Counter(d for _, d in edges)
    xs = [outd[s] for s, _ in edges]
    ys = [ind[d] for _, d in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    exp = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy))
    assert row["assortativity"] == pytest.approx(exp)
