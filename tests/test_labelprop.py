"""LPA fixtures — LabelPropagation420Test.java:85-159 ("lpa-420") and
LabelPropagationProcIntegrationTest.java:49-202 ("lpa-weighted-star"),
per FIXTURES.md §5-6."""

from tests.conftest import make_edges, make_vertices
from neo4j_graph_algorithms_spark.operators.labelprop import label_propagation

# --- lpa-420 -------------------------------------------------------------
NAMES_420 = ["Alice", "Bridget", "Charles", "Doug", "Mark", "Michael"]
SEEDS_420 = {"Alice": 2, "Bridget": 3, "Charles": 4, "Doug": 3,
             "Mark": 4, "Michael": 2}
EDGES_420 = [
    ("Alice", "Bridget"), ("Alice", "Charles"), ("Mark", "Doug"),
    ("Bridget", "Michael"), ("Doug", "Mark"), ("Michael", "Alice"),
    ("Alice", "Michael"), ("Bridget", "Alice"), ("Michael", "Bridget"),
    ("Charles", "Doug"),
]


def test_lpa_420_communities(spark):
    v = make_vertices(spark, NAMES_420, partition=SEEDS_420)
    e = make_edges(spark, EDGES_420, NAMES_420)
    res = label_propagation(v, e, max_iterations=10, direction="out")
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    idx = {n: i for i, n in enumerate(NAMES_420)}
    c1 = {got[idx["Alice"]], got[idx["Bridget"]], got[idx["Michael"]]}
    c2 = {got[idx["Charles"]], got[idx["Doug"]], got[idx["Mark"]]}
    # converged community partition: {Alice,Bridget,Michael} vs {Charles,Doug,Mark}
    assert len(c1) == 1 and len(c2) == 1
    assert c1 != c2


# --- lpa-weighted-star ---------------------------------------------------
# a=0 b=1 hubs (partition 42); leaves 2..6 on a, 7..11 on b.
STAR_NAMES = list(range(12))
STAR_PART = {0: 42, 1: 42, 2: 1, 3: 1, 4: 1, 5: 1, 6: 2,
             7: 1, 8: 1, 9: 1, 10: 1, 11: 2}
STAR_W = {0: 1.0, 1: 1.0, 2: 1.0, 3: 2.0, 4: 1.0, 5: 1.0, 6: 8.0,
          7: 1.0, 8: 2.0, 9: 1.0, 10: 1.0, 11: 8.0}
STAR_EDGES = [(0, leaf, 1.0) for leaf in range(2, 7)] + [
    (1, leaf, 1.0) for leaf in range(7, 12)
]


def _star_vertices(spark, partition=STAR_PART):
    return make_vertices(spark, STAR_NAMES, partition=partition, weight=STAR_W)


def test_star_weighted_one_iteration(spark):
    # hubs adopt label 2: vote 8.0 (leaf w=8) beats Σ(1+2+1+1)=5 for label 1
    # (LabelPropagationProcIntegrationTest.java:144-163)
    v = _star_vertices(spark)
    e = make_edges(spark, STAR_EDGES)
    res = label_propagation(v, e, max_iterations=1, direction="out")
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got[0] == 2
    assert got[1] == 2


def test_star_missing_partition_seeds_by_id(spark):
    # nonexistent partitionProperty → seed = node id; hubs adopt the
    # heavy neighbor's id-label: a→6, b→11 (:166-178)
    v = make_vertices(spark, STAR_NAMES, partition=None, weight=STAR_W)
    e = make_edges(spark, STAR_EDGES)
    res = label_propagation(v, e, max_iterations=1, direction="out",
                            partition_col=None)
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got[0] == 6
    assert got[1] == 11


def test_star_incoming_direction(spark):
    # INCOMING: leaves listen to their in-neighbor (the hub) → adopt 42
    # (:194-202)
    v = _star_vertices(spark)
    e = make_edges(spark, STAR_EDGES)
    res = label_propagation(v, e, max_iterations=1, direction="in")
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    for leaf in range(2, 12):
        assert got[leaf] == 42


def test_lpa_convergence_reporting(spark):
    # two mutually-following nodes with equal seeds converge immediately
    v = make_vertices(spark, [0, 1], partition={0: 7, 1: 7})
    e = make_edges(spark, [(0, 1, 1.0), (1, 0, 1.0)])
    res = label_propagation(v, e, max_iterations=5)
    assert res.did_converge
    assert res.ran_iterations == 1
