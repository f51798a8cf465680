"""k-means / semantic-dedup: numpy-replay parity, empty-cluster
carryover, survivor invariants, and the ivf_knn refinement path."""

import hashlib

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.pipeline.kmeans import (
    kmeans_fit, semantic_dedup,
)


def _mk_emb(spark, n=40, d=4, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    return df, vecs.astype(np.float64)


def _numpy_kmeans(vecs, k, iterations):
    """Independent replay of kmeans_fit's exact rules: md5-sample init,
    argmin ties to the smaller centroid id, 9-dp-rounded means, empty
    clusters keep their centroid, one final assignment."""
    n = len(vecs)
    order = sorted(range(n),
                   key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [vecs[i].copy() for i in order[:k]]

    def assign(cents):
        d2 = np.stack([((vecs - c) ** 2).sum(axis=1) for c in cents], axis=1)
        # argmin with tie to the smaller cid: np.argmin already picks
        # the first (smallest) index on exact ties
        return d2.argmin(axis=1), d2

    for _ in range(iterations):
        labels, _ = assign(cents)
        for c in range(k):
            members = vecs[labels == c]
            if len(members):
                cents[c] = np.round(members.mean(axis=0), 9)
    labels, d2 = assign(cents)
    return labels, np.stack(cents), d2[np.arange(n), labels]


def test_kmeans_matches_numpy_replay(spark):
    df, vecs = _mk_emb(spark)
    res = kmeans_fit(df, k=3, iterations=4)
    exp_labels, exp_cents, exp_d2 = _numpy_kmeans(vecs, 3, 4)
    got = {r["id"]: (r["cluster"], r["dist2"])
           for r in res.assignments.collect()}
    for i in range(len(vecs)):
        assert got[i][0] == exp_labels[i], f"label mismatch at {i}"
        assert got[i][1] == pytest.approx(exp_d2[i], rel=1e-12)
    assert np.allclose(np.array(res.centroids), exp_cents, atol=1e-12)
    assert res.iterations == 4


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # every vector identical: all ties resolve to centroid 0, so
    # cluster 1 is empty from round 1 and must carry its init centroid
    rows = [(i, [1.0, 2.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    res = kmeans_fit(df, k=2, iterations=2)
    labels = {r["id"]: r["cluster"] for r in res.assignments.collect()}
    assert set(labels.values()) == {0}
    assert res.centroids[1] == [1.0, 2.0]


def test_kmeans_validation(spark):
    df, _ = _mk_emb(spark, n=5)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=10)  # corpus smaller than k
    with pytest.raises(ValueError):
        kmeans_fit(df, k=2, init_centroids=[[0.0, 0.0]])  # wrong count


def test_semantic_dedup_invariants(spark):
    df, vecs = _mk_emb(spark, n=60)
    out = semantic_dedup(df, k=4, iterations=3).collect()
    res = kmeans_fit(df, k=4, iterations=3)
    members = {}
    for r in res.assignments.collect():
        members.setdefault(r["cluster"], []).append((r["dist2"], r["id"]))
    assert len(out) == len(members)  # one survivor per non-empty cluster
    assert sum(r["size"] for r in out) == 60
    for r in out:
        best = min(members[r["cluster"]])
        assert r["survivor_id"] == best[1]
        assert r["size"] == len(members[r["cluster"]])


def test_ivf_refined_degenerates_to_bruteforce_at_k1(spark):
    from neo4j_graph_algorithms_spark.pipeline.ann import (
        cosine_knn_bruteforce, ivf_knn,
    )

    df, _ = _mk_emb(spark, n=30, d=8)
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in cosine_knn_bruteforce(df, n_queries=5, k=3).collect()}
    refined = {(r["query_id"], r["rank"]): r["neighbor_id"]
               for r in ivf_knn(df, n_queries=5, k=3, n_centroids=1,
                                n_probe=1, refine_iterations=2).collect()}
    assert refined == exact


def test_ivf_refined_same_schema_and_probe_bound(spark):
    from neo4j_graph_algorithms_spark.pipeline.ann import ivf_knn

    df, _ = _mk_emb(spark, n=50, d=8)
    out = ivf_knn(df, n_queries=8, k=4, n_centroids=4, n_probe=2,
                  refine_iterations=3)
    assert out.columns == ["query_id", "neighbor_id", "rank", "sim"]
    rows = out.collect()
    assert rows and all(1 <= r["rank"] <= 4 for r in rows)
    assert all(r["query_id"] < 8 for r in rows)
