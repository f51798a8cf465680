"""Driver-side NumPy/float64 oracles for cross-checking the engine
(FIXTURES.md §10): power-iteration PageRank, union-find, synchronous
LPA, brute-force triangle counting."""

from __future__ import annotations

import numpy as np


def pagerank_oracle(n, edges, damping=0.85, iterations=100, tol=0.0,
                    weights=None, sources=None):
    """Per-node formulation: pr = base + d·Σ pr(u)·f(u→v); dangling push
    nothing; base = (1-d) (or only at sources for personalized)."""
    base = np.zeros(n) if sources is not None else np.full(n, 1.0 - damping)
    if sources is not None:
        base[list(sources)] = 1.0 - damping
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    if weights is None:
        outdeg = np.bincount(src, minlength=n).astype(np.float64)
        f = 1.0 / outdeg[src]
    else:
        w = np.asarray(weights, dtype=np.float64)
        keep = w > 0
        src, dst, w = src[keep], dst[keep], w[keep]
        wsum = np.bincount(src, weights=w, minlength=n)
        f = w / wsum[src]
    pr = base.copy()
    for _ in range(iterations):
        msg = np.bincount(dst, weights=pr[src] * f, minlength=n)
        new = base + damping * msg
        delta = np.abs(new - pr).max()
        pr = new
        if tol > 0 and delta < tol:
            break
    return pr


def wcc_oracle(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            lo, hi = min(rs, rd), max(rs, rd)
            parent[hi] = lo
    return np.array([find(i) for i in range(n)])


def sync_lpa_oracle(n, edges, seeds, node_w=None, max_iter=10, direction="out"):
    """Synchronous LPA, deterministic tie-break (max vote, min label)."""
    labels = np.array(seeds, dtype=np.int64)
    nw = np.ones(n) if node_w is None else np.asarray(node_w, dtype=np.float64)
    pairs = []
    for e in edges:
        s, d, w = (e[0], e[1], e[2] if len(e) > 2 else 1.0)
        if direction in ("out", "both"):
            pairs.append((s, d, w))
        if direction in ("in", "both"):
            pairs.append((d, s, w))
    for _ in range(max_iter):
        votes: dict[tuple[int, int], float] = {}
        for v, u, w in pairs:
            key = (v, labels[u])
            votes[key] = votes.get(key, 0.0) + w * nw[u]
        new = labels.copy()
        byv: dict[int, list[tuple[float, int]]] = {}
        for (v, lab), s in votes.items():
            byv.setdefault(v, []).append((s, lab))
        for v, cand in byv.items():
            cand.sort(key=lambda t: (-t[0], t[1]))
            new[v] = cand[0][1]
        if (new == labels).all():
            return new, True
        labels = new
    return labels, False


def triangles_oracle(n, und_edges):
    """Brute force: adjacency sets; count per node."""
    adj = [set() for _ in range(n)]
    for s, d in und_edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    t = np.zeros(n, dtype=np.int64)
    total = 0
    for a in range(n):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    total += 1
                    t[a] += 1
                    t[b] += 1
                    t[c] += 1
    deg = np.array([len(adj[i]) for i in range(n)], dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        coef = np.where(deg >= 2, 2.0 * t / (deg * (deg - 1)), 0.0)
    return t, coef, total
