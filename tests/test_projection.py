"""JL random projection (pipeline/projection.py)."""

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.pipeline.projection import (
    rademacher_signs,
    random_project,
)


def _emb(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def test_matches_numpy_matmul(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(20, 12)).astype(np.float32)
    signs = rademacher_signs(12, 6, seed=7)
    want = (x.astype(np.float64) @ signs) / np.sqrt(6)
    out = random_project(_emb(spark, x), out_dim=6, seed=7).collect()
    got = np.array([r.projected for r in
                    sorted(out, key=lambda r: r.vec_id)])
    assert np.allclose(got, want, atol=1e-9)


def test_signs_deterministic_and_balanced():
    a = rademacher_signs(64, 16, seed=42)
    b = rademacher_signs(64, 16, seed=42)
    assert (a == b).all()
    assert set(np.unique(a)) == {-1.0, 1.0}
    # a fair coin: the mean sign over 1024 draws is near 0
    assert abs(a.mean()) < 0.15
    assert (rademacher_signs(64, 16, seed=43) != a).any()


def test_distance_preservation(spark):
    # JL property: pairwise distances survive within a loose epsilon
    rng = np.random.default_rng(11)
    x = rng.normal(size=(30, 64)).astype(np.float32)
    out = random_project(_emb(spark, x), out_dim=32, seed=1).collect()
    p = np.array([r.projected for r in
                  sorted(out, key=lambda r: r.vec_id)])
    d_in = np.linalg.norm(x[:15, None, :] - x[None, 15:, :], axis=2)
    d_out = np.linalg.norm(p[:15, None, :] - p[None, 15:, :], axis=2)
    ratio = d_out / d_in
    assert 0.5 < ratio.min() and ratio.max() < 1.6


def test_plan_is_udf_free(spark):
    df = _emb(spark, np.ones((4, 8), dtype=np.float32))
    plan = random_project(df, out_dim=4, seed=5)._jdf \
        .queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_dimension_guard(spark):
    df = _emb(spark, np.ones((2, 8), dtype=np.float32))
    with pytest.raises(ValueError, match="plan-as-constants"):
        random_project(df, out_dim=10000, seed=1, in_dim=8)
