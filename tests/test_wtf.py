"""Who-To-Follow composition (operators/wtf.py) vs a numpy replay."""

import numpy as np

from neo4j_graph_algorithms_spark.operators.wtf import who_to_follow


def _np_ppr(n, edges, sources, iters):
    out = [[] for _ in range(n)]
    for s, d in edges:
        out[s].append(d)
    base = np.zeros(n)
    for s in sources:
        base[s] = 0.15
    r = base.copy()
    for _ in range(iters):
        nxt = base.copy()
        for s in range(n):
            if out[s]:
                share = 0.85 * r[s] / len(out[s])
                for d in out[s]:
                    nxt[d] += share
        r = nxt
    return r


def _np_salsa(nodes, edges, iters):
    outd, ind = {}, {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    n = len(nodes)
    hub = {v: 1.0 / n for v in nodes}
    auth = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        hraw = {v: 0.0 for v in nodes}
        for s, d in edges:
            hraw[s] += auth[d] / ind[d]
        z = sum(abs(x) for x in hraw.values()) or 1.0
        hub = {v: hraw[v] / z for v in nodes}
        araw = {v: 0.0 for v in nodes}
        for s, d in edges:
            araw[d] += hub[s] / outd[s]
        z = sum(abs(x) for x in araw.values()) or 1.0
        auth = {v: araw[v] / z for v in nodes}
    return auth


def _replay(n, edges, user, circle_k, iters, top_n):
    ppr = _np_ppr(n, edges, [user], iters)
    order = sorted((i for i in range(n) if i != user and
                    round(ppr[i], 9) > 0),
                   key=lambda i: (-round(ppr[i], 9), i))
    circle = set(order[:circle_k])
    sub = [(s, d) for s, d in edges if s in circle]
    nodes = sorted({v for e in sub for v in e})
    auth = _np_salsa(nodes, sub, iters)
    followed = {d for s, d in edges if s == user}
    cand = sorted(
        ((i, round(a, 9)) for i, a in auth.items()
         if i != user and i not in followed and round(a, 9) > 0),
        key=lambda t: (-t[1], t[0]))
    return [i for i, _ in cand[:top_n]]


def _spark_wtf(spark, n, edges, user, **kw):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    res = who_to_follow(v, e, user, **kw)
    return [r.id for r in res.recommendations.collect()]


def test_small_follow_graph(spark):
    # 0 follows 1,2; 1,2 both follow 3 and 4; 2 follows 5
    edges = [(0, 1), (0, 2), (1, 3), (1, 4), (2, 3), (2, 4), (2, 5),
             (3, 4), (5, 0)]
    got = _spark_wtf(spark, 6, edges, 0, circle_k=3,
                     ppr_iterations=6, salsa_iterations=6, top_n=3)
    want = _replay(6, edges, 0, 3, 6, 3)
    assert got == want
    # 3 and 4 (followed by the whole circle) must be recommended;
    # 1 and 2 (already followed) must not
    assert set(got) & {3, 4} == {3, 4}
    assert not set(got) & {1, 2}


def test_random_graph_matches_replay(spark):
    rng = np.random.default_rng(5)
    n = 25
    edges = sorted({(int(rng.integers(n)), int(rng.integers(n)))
                    for _ in range(120)})
    edges = [(s, d) for s, d in edges if s != d]
    got = _spark_wtf(spark, n, edges, 0, circle_k=8,
                     ppr_iterations=5, salsa_iterations=5, top_n=5)
    want = _replay(n, edges, 0, 8, 5, 5)
    assert got == want


def test_excludes_user_and_followed(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 1)]
    got = _spark_wtf(spark, 3, edges, 0, circle_k=2,
                     ppr_iterations=4, salsa_iterations=4, top_n=3)
    assert 0 not in got and 1 not in got  # self and already-followed
