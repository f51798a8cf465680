"""SimRank vs a dense in-memory replay (operators/simrank.py)."""

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.operators.simrank import simrank


def _dense_simrank(n, edges, c, iters):
    """Textbook O(n^2 d^2) reference (Jeh & Widom 2002, eq. 4)."""
    in_nbrs = [[] for _ in range(n)]
    for s, d in edges:
        if s not in in_nbrs[d]:
            in_nbrs[d].append(s)
    S = np.eye(n)
    for _ in range(iters):
        N = np.eye(n)
        for a in range(n):
            for b in range(n):
                if a == b or not in_nbrs[a] or not in_nbrs[b]:
                    continue
                t = sum(S[i, j] for i in in_nbrs[a] for j in in_nbrs[b])
                N[a, b] = c * t / (len(in_nbrs[a]) * len(in_nbrs[b]))
        S = N
    return S


def _spark_simrank(spark, n, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = np.zeros((n, n))
    for r in simrank(df, **kw).collect():
        out[r.a, r.b] = r.similarity
        out[r.b, r.a] = r.similarity
    np.fill_diagonal(out, 1.0)
    return out


def test_textbook_univ_graph(spark):
    # the paper's Univ/ProfA/ProfB/StudentA/StudentB example
    # 0=Univ 1=ProfA 2=ProfB 3=StudentA 4=StudentB
    edges = [(0, 1), (0, 2), (1, 3), (2, 4), (3, 0), (4, 2)]
    want = _dense_simrank(5, edges, 0.8, 6)
    got = _spark_simrank(spark, 5, edges, c=0.8, iterations=6)
    assert np.allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs(spark, seed):
    rng = np.random.default_rng(seed)
    n = 12
    edges = list({(int(rng.integers(n)), int(rng.integers(n)))
                  for _ in range(30)})
    edges = [(s, d) for s, d in edges if s != d]
    want = _dense_simrank(n, edges, 0.6, 4)
    got = _spark_simrank(spark, n, edges, c=0.6, iterations=4)
    assert np.allclose(got, want, atol=1e-12)


def test_prune_underestimates_only(spark):
    rng = np.random.default_rng(7)
    n = 10
    edges = list({(int(rng.integers(n)), int(rng.integers(n)))
                  for _ in range(25)})
    edges = [(s, d) for s, d in edges if s != d]
    exact = _spark_simrank(spark, n, edges, c=0.8, iterations=4)
    pruned = _spark_simrank(spark, n, edges, c=0.8, iterations=4,
                            prune_threshold=0.05)
    # truncation can only remove mass (Lizorkin et al. bound)
    assert (pruned <= exact + 1e-12).all()
    assert (exact - pruned).max() <= 0.8 * 0.05 / (1 - 0.8) + 1e-12


def test_top_k(spark):
    edges = [(0, 2), (1, 2), (0, 3), (1, 3), (0, 4), (1, 4)]
    out = simrank(
        spark.createDataFrame(edges, "src long, dst long"),
        c=0.8, iterations=3, top_k=1)
    per_a = {}
    for r in out.collect():
        per_a.setdefault(r.a, []).append(r)
    for a, rows in per_a.items():
        assert len(rows) == 1
