"""OPIC crawl-importance and bow-tie decomposition."""

import random

import pytest

from neo4j_graph_algorithms_spark.operators.bowtie import (
    bowtie_decomposition,
    reachable_set,
)
from neo4j_graph_algorithms_spark.operators.opic import opic_importance


def _vertices(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "id long")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _opic_python(n, pairs, supersteps):
    """Plain-python replay of the synchronous OPIC recurrence."""
    out = {}
    for s, d in pairs:
        out.setdefault(s, []).append(d)
    cash = [1.0 / n] * n
    hist = [0.0] * n
    for _ in range(supersteps):
        dm = sum(cash[i] for i in range(n) if i not in out)
        nxt = [dm / n] * n
        for s, ds in out.items():
            f = cash[s] / len(ds)
            for d in ds:
                nxt[d] += f
        hist = [hist[i] + cash[i] for i in range(n)]
        cash = nxt
    return [(hist[i] + cash[i]) / (supersteps + 1) for i in range(n)]


def test_opic_matches_python_replay(spark):
    rng = random.Random(7)
    n = 40
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(140)
                    if True})
    pairs = [(s, d) for s, d in pairs if s != d]
    got = {
        r["id"]: r["importance"]
        for r in opic_importance(
            _vertices(spark, n), _edges(spark, pairs), supersteps=7
        ).collect()
    }
    want = _opic_python(n, pairs, 7)
    assert len(got) == n
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12)
    # cash conservation: importance is a probability vector
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_opic_star_ranks_hub_highest(spark):
    # spokes -> hub; hub dangles. Hub banks everyone's cash every step.
    pairs = [(i, 0) for i in range(1, 6)]
    res = {
        r["id"]: r["importance"]
        for r in opic_importance(
            _vertices(spark, 6), _edges(spark, pairs), supersteps=5
        ).collect()
    }
    assert res[0] == max(res.values())
    spoke = [v for k, v in res.items() if k != 0]
    assert max(spoke) == pytest.approx(min(spoke), abs=1e-12)


def test_reachable_set_multi_source(spark):
    pairs = [(0, 1), (1, 2), (5, 6)]
    seeds = spark.createDataFrame([(0,), (5,)], "id long")
    got = {r["id"] for r in
           reachable_set(_edges(spark, pairs), seeds).collect()}
    assert got == {0, 1, 2, 5, 6}


def test_bowtie_classes_on_known_graph(spark):
    # core cycle 1->2->3->1; IN 0->1; OUT 3->4; tendril 0->5;
    # tube 0->6->4; disconnected 7->8
    pairs = [(1, 2), (2, 3), (3, 1), (0, 1), (3, 4),
             (0, 5), (0, 6), (6, 4), (7, 8)]
    got = {r["id"]: r["bowtie_class"] for r in
           bowtie_decomposition(_vertices(spark, 9),
                                _edges(spark, pairs)).collect()}
    assert got == {
        0: "IN", 1: "CORE", 2: "CORE", 3: "CORE", 4: "OUT",
        5: "TENDRILS", 6: "TENDRILS", 7: "DISCONNECTED",
        8: "DISCONNECTED",
    }


def test_bowtie_all_core_when_strongly_connected(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    got = {r["id"]: r["bowtie_class"] for r in
           bowtie_decomposition(_vertices(spark, 3),
                                _edges(spark, pairs)).collect()}
    assert set(got.values()) == {"CORE"}


def test_ensemble_near_dup_signals(spark):
    from pyspark.sql import functions as F
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        ensemble_dedup_clusters,
        ensemble_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zeta"),   # exact dup of 0
            (2, "alpha beta gamma delta epsilon eta"),    # near dup of 0
            (3, "totally different words here now ok"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]):
             (r["via_exact"], r["via_minhash"], r["via_simhash"])
             for r in ensemble_near_dup_pairs(
                 docs, n_hashes=4, bands=2, simhash_bits=16,
                 max_hamming=3, simhash_bands=4).collect()}
    # the exact pair is found, flagged via_exact (other signals fire
    # too — identical text collides in every scheme)
    assert pairs[(0, 1)][0] == 1
    # doc 3 shares nothing
    assert not any(3 in p for p in pairs)

    clusters = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
                for r in ensemble_dedup_clusters(
                    docs.withColumn("n_tokens", F.lit(6)),
                    quality_col="n_tokens", n_hashes=4, bands=2,
                    simhash_bits=16, max_hamming=3,
                    simhash_bands=4).collect()}
    assert clusters[0] == (0, 1)          # canonical of its cluster
    assert clusters[1][0] == 0            # exact dup joins cluster 0
    assert clusters[3] == (3, 1)          # singleton stays canonical
