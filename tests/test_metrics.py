"""NMI / ARI community comparison vs a hand-rolled python oracle."""

import math
from collections import Counter

import pytest

from neo4j_graph_algorithms_spark.operators.metrics import community_compare


def _py_nmi_ari(la, lb):
    n = len(la)
    ct = Counter(zip(la, lb))
    ma = Counter(la)
    mb = Counter(lb)
    mi = sum((nij / n) * math.log(n * nij / (ma[i] * mb[j]))
             for (i, j), nij in ct.items())
    ha = -sum((c / n) * math.log(c / n) for c in ma.values())
    hb = -sum((c / n) * math.log(c / n) for c in mb.values())
    nmi = 1.0 if ha + hb == 0 else 2 * mi / (ha + hb)

    def c2(x):
        return x * (x - 1) / 2

    s_nij = sum(c2(v) for v in ct.values())
    s_a = sum(c2(v) for v in ma.values())
    s_b = sum(c2(v) for v in mb.values())
    exp = s_a * s_b / c2(n)
    den = (s_a + s_b) / 2 - exp
    ari = 1.0 if den == 0 else (s_nij - exp) / den
    return nmi, ari


def _labels(spark, vals):
    return spark.createDataFrame(list(enumerate(vals)), "id long, label long")


def test_identical_partitions_score_one(spark):
    vals = [i % 4 for i in range(40)]
    row = community_compare(_labels(spark, vals), _labels(spark, vals)).first()
    assert row["nmi"] == pytest.approx(1.0)
    assert row["ari"] == pytest.approx(1.0)
    assert row["n"] == 40


def test_single_cluster_convention(spark):
    a = _labels(spark, [0] * 20)
    row = community_compare(a, a).first()
    assert row["nmi"] == 1.0 and row["ari"] == 1.0


def test_matches_python_oracle_on_random_labelings(spark):
    import random
    rng = random.Random(17)
    for trial in range(3):
        la = [rng.randrange(5) for _ in range(60)]
        lb = [rng.randrange(4) for _ in range(60)]
        row = community_compare(_labels(spark, la), _labels(spark, lb)).first()
        nmi, ari = _py_nmi_ari(la, lb)
        assert row["nmi"] == pytest.approx(nmi, rel=1e-9), trial
        assert row["ari"] == pytest.approx(ari, rel=1e-9), trial


def test_permuted_label_ids_do_not_matter(spark):
    vals = [i % 3 for i in range(30)]
    perm = [(v + 7) * 100 for v in vals]
    row = community_compare(_labels(spark, vals), _labels(spark, perm)).first()
    assert row["nmi"] == pytest.approx(1.0)
    assert row["ari"] == pytest.approx(1.0)


def test_inner_join_scope_and_custom_columns(spark):
    a = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "id long, community long")
    b = spark.createDataFrame(
        [(i, i % 2) for i in range(5, 15)], "id long, cluster long")
    row = community_compare(a, b, col_a="community", col_b="cluster").first()
    assert row["n"] == 5  # ids 5..9 only
