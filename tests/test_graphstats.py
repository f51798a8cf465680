"""degree_histogram / graph_summary: python-replay parity on a
hand-built graph with known reciprocity/assortativity."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_edges
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


def test_cocitation_and_coupling_pairs(spark):
    from neo4j_graph_algorithms_spark.operators.cocitation import (
        cocitation_pairs, coupling_pairs,
    )

    # sources 0,1 both cite (10, 11); 2 cites 10 only; hub 9 cites all
    edges = ([(0, 10), (0, 11), (1, 10), (1, 11), (2, 10)]
             + [(9, d) for d in range(10, 14)])
    e = spark.createDataFrame(edges, "src long, dst long")
    cc = {(r["item_a"], r["item_b"]): r["n_common"]
          for r in cocitation_pairs(e).collect()}
    # hub 9 contributes to every pair among 10..13
    assert cc[(10, 11)] == 3  # sources 0, 1, 9
    assert cc[(12, 13)] == 1  # source 9 only
    # pivot_cutoff prunes hub 9 (out-degree 4 > 3): its pairs vanish
    cc2 = {(r["item_a"], r["item_b"]): r["n_common"]
           for r in cocitation_pairs(e, pivot_cutoff=3).collect()}
    assert cc2[(10, 11)] == 2 and (12, 13) not in cc2
    # coupling: 0 and 1 share out-links {10, 11}
    cp = {(r["item_a"], r["item_b"]): r["n_common"]
          for r in coupling_pairs(e).collect()}
    assert cp[(0, 1)] == 2
    # min_count filter
    assert all(n >= 2 for n in
               (r["n_common"] for r in
                coupling_pairs(e, min_count=2).collect()))


def test_powerlaw_fit_matches_python(spark):
    import math
    import random
    rng = random.Random(5)
    pairs = list({(rng.randrange(50), rng.randrange(200)) for _ in range(600)})
    e = make_edges(spark, pairs)
    from neo4j_graph_algorithms_spark.operators.graphstats import powerlaw_fit
    row = powerlaw_fit(e, direction="in", d_min=2).first()
    indeg = {}
    for _, d in pairs:
        indeg[d] = indeg.get(d, 0) + 1
    tail = [v for v in indeg.values() if v >= 2]
    exp = 1.0 + len(tail) / sum(math.log(v / 1.5) for v in tail)
    assert row["alpha"] == pytest.approx(exp, rel=1e-9)
    assert row["n_tail"] == len(tail)
    with pytest.raises(ValueError):
        powerlaw_fit(e, direction="sideways")


def test_double_sweep_known_graphs(spark):
    from neo4j_graph_algorithms_spark.operators.graphstats import (
        diameter_double_sweep,
    )
    # path 0-1-2-3-4: diameter 4, double sweep exact on trees
    e = make_edges(spark, [(i, i + 1) for i in range(4)])
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    row = diameter_double_sweep(v, e).first()
    assert row["lower_bound"] == 4
    assert row["peripheral_id"] == 4  # farthest from 0
    # 6-ring: every eccentricity is 3
    e = make_edges(spark, [(i, (i + 1) % 6) for i in range(6)])
    v = spark.createDataFrame([(i,) for i in range(6)], "id long")
    assert diameter_double_sweep(v, e).first()["lower_bound"] == 3
    # star from center: two hops leaf-to-leaf
    e = make_edges(spark, [(0, i) for i in range(1, 6)])
    v = spark.createDataFrame([(i,) for i in range(6)], "id long")
    assert diameter_double_sweep(v, e).first()["lower_bound"] == 2


def test_butterfly_count_known_bicliques(spark):
    from neo4j_graph_algorithms_spark.operators.cocitation import (
        butterfly_count,
    )

    # K_{2,2}: exactly one butterfly
    k22 = [(0, 10), (0, 11), (1, 10), (1, 11)]
    df = spark.createDataFrame(k22, "src long, dst long")
    row = butterfly_count(df).first()
    assert (row["butterflies"], row["wedge_pairs"]) == (1, 1)

    # K_{2,3}: the source pair shares 3 targets -> C(3,2) = 3
    k23 = [(s, t) for s in (0, 1) for t in (10, 11, 12)]
    row = butterfly_count(
        spark.createDataFrame(k23, "src long, dst long")).first()
    assert (row["butterflies"], row["wedge_pairs"]) == (3, 1)

    # two disjoint K_{2,2}s + a wedge-only pair (1 shared target)
    two = k22 + [(4, 20), (4, 21), (5, 20), (5, 21), (8, 30), (9, 30)]
    row = butterfly_count(
        spark.createDataFrame(two, "src long, dst long")).first()
    assert (row["butterflies"], row["wedge_pairs"]) == (2, 2)

    # hub target above the cutoff is pruned before wedges
    hub = k22 + [(s, 99) for s in range(6)]
    row = butterfly_count(
        spark.createDataFrame(hub, "src long, dst long"),
        pivot_cutoff=4).first()
    assert row["butterflies"] == 1


def test_rewire_preserves_degree_sequences(spark):
    import random

    from neo4j_graph_algorithms_spark.operators.nullmodel import (
        motif_zscore,
        rewire_configuration_model,
    )

    rng = random.Random(3)
    pairs = sorted({(rng.randrange(20), rng.randrange(20))
                    for _ in range(60)})
    e = spark.createDataFrame(pairs, "src long, dst long")

    def degs(df):
        out = {r["src"]: r["cnt"] for r in
               df.groupBy("src").agg(F.count(F.lit(1)).alias("cnt"))
               .collect()}
        inn = {r["dst"]: r["cnt"] for r in
               df.groupBy("dst").agg(F.count(F.lit(1)).alias("cnt"))
               .collect()}
        return out, inn

    r1 = rewire_configuration_model(e, seed=1)
    assert degs(r1) == degs(e)          # every out/in degree preserved
    assert r1.count() == len(pairs)
    # deterministic per seed, different across seeds
    r1b = rewire_configuration_model(e, seed=1)
    assert sorted(map(tuple, r1.collect())) == \
        sorted(map(tuple, r1b.collect()))
    r2 = rewire_configuration_model(e, seed=2)
    assert sorted(map(tuple, r2.collect())) != \
        sorted(map(tuple, r1.collect()))

    z = motif_zscore(10.0, [4.0, 6.0, 5.0])
    assert z["null_mean"] == 5.0 and z["z"] > 0
