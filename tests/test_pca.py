"""pca: covariance vs numpy, fit orthonormality/variance order, sign
canonicalization, projection replay."""

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.pipeline.pca import (
    covariance_matrix, pca_fit, pca_project,
)


def _emb(spark, x):
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    # anisotropic: strong first axis so the top component is unambiguous
    x = rng.randn(120, 6) * np.array([5.0, 2.0, 1.0, 0.5, 0.25, 0.1])
    return x @ np.linalg.qr(rng.randn(6, 6))[0]  # rotate


def test_covariance_matches_numpy(spark, data):
    got = {(r["i"], r["j"]): r["cov"] for r in
           covariance_matrix(_emb(spark, data)).collect()}
    want = np.cov(data, rowvar=False, ddof=1)
    assert len(got) == 36
    for i in range(6):
        for j in range(6):
            assert got[(i, j)] == pytest.approx(want[i, j], abs=1e-9), (i, j)


def test_fit_and_project(spark, data):
    df = _emb(spark, data)
    model = pca_fit(df, k=3)
    comps = np.array(model.components)
    # orthonormal rows, descending explained variance
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    ev = model.explained_variance
    assert ev == sorted(ev, reverse=True) and ev[0] > ev[1] > 0
    # sign canonicalization: the largest-|loading| coordinate positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0
    # eigenvalues match numpy's on the same covariance
    want = np.linalg.eigvalsh(np.cov(data, rowvar=False, ddof=1))[::-1][:3]
    assert np.allclose(ev, want, rtol=1e-9)
    # projection replay
    got = {r["id"]: (r["p0"], r["p1"], r["p2"]) for r in
           pca_project(df, model).collect()}
    centered = data - np.array(model.mean)
    exp = centered @ comps.T
    for i in range(len(data)):
        assert got[i] == pytest.approx(tuple(exp[i]), abs=1e-9), i
    # projected variance equals explained variance
    assert np.allclose(np.var(exp, axis=0, ddof=1), ev, rtol=1e-9)
