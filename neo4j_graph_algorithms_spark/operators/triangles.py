"""Triangle counting + local clustering coefficient.

Semantics from ``algo.triangleCount`` / ``algo.triangle.stream``
(reference: algo/.../TriangleProc.java:64-238): the graph is always
loaded **undirected, sorted, deduplicated** (TriangleProc.java:76-88
``.withSort(true).asUndirected(true)``); each triangle (a,b,c) is
emitted/counted exactly once via the ``a < b < c`` ordering guard
(IntersectingTriangleCount.java:134-160,
core/.../heavyweight/AdjacencyMatrix.java:392-404); the local clustering
coefficient is ``C(v) = 2·T(v) / (deg(v)·(deg(v)−1))``, 0 when deg < 2,
with the average coefficient the mean over all nodes
(TriangleCountAlgorithm.java:92-97, IntersectingTriangleCount.java:88-98).
Self-loops survive projection but can never appear in a triangle (the
strict ordering guard excludes them), and the coefficient's degree is
the merged undirected adjacency's degree.

Physical plan — not the reference's shared atomic node queue but the
standard distributed restatement with **degree orientation** (the
"compact-forward" trick): orient each undirected edge from the
lower-(degree, id) endpoint to the higher one. Every vertex's oriented
out-degree is then O(√m)-bounded on power-law graphs, so the
wedge-generating self-join (the hot spot) never explodes on hubs — this
replaces the reference's accumulated-degree partition sizing as the
skew defense. Enumeration: wedges = oriented ⋈ oriented on the common
lower endpoint, closed by a join against the oriented edge set. All
JVM-side joins; Catalyst/AQE pick broadcast vs sort-merge per side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.graph import as_undirected

__all__ = ["triangle_stream", "triangle_count", "clustering_coefficient",
           "balanced_triads", "triangle_count_sampled", "TriangleResult"]


@dataclass
class TriangleResult:
    node_counts: DataFrame  # (id, triangles, coefficient)
    triangle_count: int
    average_coefficient: float


def _canonical_edges(edges: DataFrame, already_undirected: bool = False) -> DataFrame:
    """Undirected, deduplicated, canonically ordered (lo < hi) edge set."""
    e = edges.select("src", "dst") if already_undirected else as_undirected(
        edges.select("src", "dst"))
    return (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .dropDuplicates(["lo", "hi"])
    )


def _oriented(canon: DataFrame) -> DataFrame:
    """Orient edges by the (degree, id) total order: low endpoint → high.

    ``a/b`` hold original ids; ``ra/rb`` their order keys as
    ``struct(deg, id)`` (Spark structs compare lexicographically), so no
    global ranking pass is needed — the order key is computed with two
    vertex-sized joins that broadcast/sort-merge like any dimension join.
    Ties are impossible because ids are unique.
    """
    deg = (
        canon.select(F.col("lo").alias("id"))
        .union(canon.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        canon.join(deg.withColumnRenamed("id", "lo").withColumnRenamed("deg", "dlo"), "lo")
        .join(deg.withColumnRenamed("id", "hi").withColumnRenamed("deg", "dhi"), "hi")
    )
    klo = F.struct(F.col("dlo").alias("d"), F.col("lo").alias("i"))
    khi = F.struct(F.col("dhi").alias("d"), F.col("hi").alias("i"))
    lo_first = klo < khi
    return e.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("a"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("b"),
        F.when(lo_first, klo).otherwise(khi).alias("ra"),
        F.when(lo_first, khi).otherwise(klo).alias("rb"),
    )


def triangle_stream(edges: DataFrame, already_undirected: bool = False) -> DataFrame:
    """All triangles as rows ``(node_a, node_b, node_c)``, each once,
    with ``node_a < node_b < node_c`` (≡ algo.triangle.stream,
    TriangleStream emission order guard nodeA<nodeB<nodeC)."""
    canon = _canonical_edges(edges, already_undirected)
    o = _oriented(canon).persist()
    e1 = o.select(F.col("a").alias("u"), F.col("b").alias("v"), F.col("rb").alias("rv"))
    e2 = o.select(F.col("a").alias("u"), F.col("b").alias("w"), F.col("rb").alias("rw"))
    wedges = e1.join(e2, "u").filter(F.col("rv") < F.col("rw"))
    closer = o.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tris = wedges.join(closer, ["v", "w"]).select("u", "v", "w")
    out = tris.select(
        F.least("u", "v", "w").alias("node_a"),
        F.greatest(F.least("u", "v"), F.least(F.greatest("u", "v"), F.col("w"))
                   ).alias("node_b"),
        F.greatest("u", "v", "w").alias("node_c"),
    )
    return out


def triangle_count(
    vertices: DataFrame,
    edges: DataFrame,
    already_undirected: bool = False,
) -> TriangleResult:
    """Per-node triangle counts + clustering coefficients + globals.

    Returns ``node_counts(id, triangles, coefficient)`` covering every
    vertex (0 triangles / 0.0 coefficient included), the global triangle
    count, and the average clustering coefficient.
    """
    canon = _canonical_edges(edges, already_undirected).persist()
    tris = triangle_stream(
        canon.select(F.col("lo").alias("src"), F.col("hi").alias("dst")),
        already_undirected=True,
    )
    per_node = (
        tris.select(F.explode(F.array("node_a", "node_b", "node_c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        canon.select(F.col("lo").alias("id"))
        .union(canon.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    node_counts = (
        vertices.select("id")
        .join(per_node, "id", "left")
        .join(deg, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.when(
                F.coalesce(F.col("deg"), F.lit(0)) >= 2,
                2.0 * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)).alias("coefficient"),
        )
    ).persist()
    agg = node_counts.agg(
        (F.sum("triangles") / 3).cast("long").alias("t"),
        F.avg("coefficient").alias("c"),
    ).first()
    canon.unpersist()
    return TriangleResult(node_counts, int(agg["t"] or 0), float(agg["c"] or 0.0))


def clustering_coefficient(vertices: DataFrame, edges: DataFrame,
                           already_undirected: bool = False) -> DataFrame:
    """(id, coefficient) — ≡ algo.triangleCount's clusteringCoefficient
    write property (TriangleCountAlgorithm.java:92-97)."""
    return triangle_count(vertices, edges, already_undirected).node_counts.select(
        "id", "coefficient"
    )


def balanced_triads(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """(id, balanced, unbalanced) — per-node balanced/unbalanced triad
    counts over signed edge weights (≡ algo.balancedTriads,
    BalancedTriadsProc.java:57-95; a triad is balanced iff the product
    of its three weights is >= 0, HugeBalancedTriads.java:76).

    Parallel edges keep the max weight; the triangle machinery reuses
    the degree-oriented enumeration (no hub blowup)."""
    w = F.col("weight").cast("double") if "weight" in edges.columns else F.lit(1.0)
    canon_w = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("lo"),
                F.greatest("src", "dst").alias("hi"), w.alias("weight"))
        .groupBy("lo", "hi").agg(F.max("weight").alias("weight"))
        .persist()
    )
    tris = triangle_stream(
        canon_w.select(F.col("lo").alias("src"), F.col("hi").alias("dst")),
        already_undirected=True,
    )
    def _w(a, b, alias):
        return canon_w.select(F.col("lo").alias(a), F.col("hi").alias(b),
                              F.col("weight").alias(alias))
    signed = (
        tris.join(_w("node_a", "node_b", "_w1"), ["node_a", "node_b"])
        .join(_w("node_b", "node_c", "_w2"), ["node_b", "node_c"])
        .join(_w("node_a", "node_c", "_w3"), ["node_a", "node_c"])
        .withColumn(
            "_bal",
            (F.col("_w1") * F.col("_w2") * F.col("_w3") >= 0.0).cast("long"),
        )
    )
    per_node = (
        signed.select(
            F.explode(F.array("node_a", "node_b", "node_c")).alias("id"), "_bal"
        )
        .groupBy("id")
        .agg(F.sum("_bal").alias("balanced"),
             F.sum(1 - F.col("_bal")).alias("unbalanced"))
    )
    return (
        vertices.select("id")
        .join(per_node, "id", "left")
        .select("id",
                F.coalesce("balanced", F.lit(0)).alias("balanced"),
                F.coalesce("unbalanced", F.lit(0)).alias("unbalanced"))
    )


def triangle_count_incremental(
    vertices: DataFrame,
    old_edges: DataFrame,
    new_edges: DataFrame,
    prev_counts: DataFrame,
) -> TriangleResult:
    """Update per-node triangle counts after *adding* ``new_edges``
    without re-enumerating the old graph's wedges.

    Only triangles containing ≥1 new edge can appear. Each such
    triangle is discovered once per new edge it contains (join every
    new canonical pair (a,b) with the union adjacency of ``a``, then
    close the wedge against the union edge set, keeping per-side
    is-new flags), carries ``k = 1 + new(a,w) + new(b,w)`` new edges,
    and contributes weight ``1/k`` to each of its three corners — the
    ``k`` discoveries then sum to exactly 1 per corner, so no
    dedup/canonical-discovery bookkeeping is needed. Cost is
    ``O(Σ_{(a,b)∈Δ} deg'(a))`` wedge candidates instead of the full
    recompute's ``O(Σ_v deg(v)²)`` — the old edge table is scanned
    (for adjacency) but never wedge-joined against itself. Coefficients
    are re-derived from the union degrees for every vertex. Edge
    deletions are out of scope (they remove triangles).

    The driver oracle replays full per-node triangle counting on the
    union edge set (query ``triangles_incremental``).
    """
    c_old = _canonical_edges(old_edges).persist()
    c_new = (
        _canonical_edges(new_edges)
        .join(c_old, ["lo", "hi"], "left_anti")  # only genuinely new pairs
        .persist()
    )
    is_new = F.col("_new")
    all_flagged = (
        c_old.withColumn("_new", F.lit(False))
        .unionByName(c_new.withColumn("_new", F.lit(True)))
        .persist()
    )
    # symmetric union adjacency with the is-new flag
    sym = all_flagged.select(
        F.col("lo").alias("u"), F.col("hi").alias("w"), "_new"
    ).unionByName(all_flagged.select(
        F.col("hi").alias("u"), F.col("lo").alias("w"), "_new"))

    # wedges from each new edge (a,b): w ∈ N'(a) \ {b}
    wedge = (
        c_new.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        .join(sym.select(F.col("u").alias("a"), "w",
                         F.col("_new").alias("_new_aw")), "a")
        .filter(F.col("w") != F.col("b"))
    )
    # close against (b,w) in the union set (canonical lookup)
    closer = all_flagged.select(
        F.least("lo", "hi").alias("_clo"), F.greatest("lo", "hi").alias("_chi"),
        F.col("_new").alias("_new_bw"))
    tri = wedge.join(
        closer,
        (F.least("b", "w") == F.col("_clo"))
        & (F.greatest("b", "w") == F.col("_chi")),
    )
    k = (F.lit(1) + F.col("_new_aw").cast("int")
         + F.col("_new_bw").cast("int"))
    delta = (
        tri.select(F.explode(F.array("a", "b", "w")).alias("id"),
                   (F.lit(1.0) / k).alias("_wgt"))
        .groupBy("id")
        .agg(F.round(F.sum("_wgt")).cast("long").alias("_dtri"))
    )

    deg = (
        all_flagged.select(F.col("lo").alias("id"))
        .union(all_flagged.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    node_counts = (
        vertices.select("id")
        .join(prev_counts.select("id", F.col("triangles").alias("_prev")),
              "id", "left")
        .join(delta, "id", "left")
        .join(deg, "id", "left")
        .select(
            "id",
            (F.coalesce(F.col("_prev"), F.lit(0))
             + F.coalesce(F.col("_dtri"), F.lit(0))).alias("triangles"),
            F.col("deg"),
        )
        .select(
            "id", "triangles",
            F.when(
                F.coalesce(F.col("deg"), F.lit(0)) >= 2,
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)).alias("coefficient"),
        )
        .persist()
    )
    agg = node_counts.agg(
        (F.sum("triangles") / 3).cast("long").alias("t"),
        F.avg("coefficient").alias("c"),
    ).first()
    c_old.unpersist()
    c_new.unpersist()
    all_flagged.unpersist()
    return TriangleResult(node_counts, int(agg["t"]), float(agg["c"] or 0.0))


def triangle_count_sampled(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    p: float = 0.1,
    seed: int = 0,
    already_undirected: bool = False,
) -> TriangleResult:
    """DOULION edge-sparsified triangle counting (Tsourakakis, Kang,
    Miller, Faloutsos — KDD 2009): keep each canonical undirected edge
    with probability ``p``, count triangles EXACTLY on the sparsified
    graph, scale counts by ``1/p³`` (an unbiased estimator of the true
    count; per-node estimates are scaled the same way).

    This is the 100-TB scale path when exact enumeration's wedge join
    is too expensive even degree-oriented: the sample shrinks the edge
    set by ``p`` BEFORE any join, so wedge work drops by ~``p²`` and
    the estimator's relative error is O(1/√(p³·T)) — negligible for
    web-scale triangle counts. The coin flip is a deterministic
    md5-derived hash of ``(lo, hi, seed)`` (dedup.py's base-hash shape),
    NOT an RNG: reruns and the DuckDB oracle keep the identical edge
    sample, so the driver check is bit-exact, not statistical.

    Coefficients use the SAMPLED degree (the sparsified graph's own
    clustering coefficient) — documented: unbiasing the coefficient
    would need per-node degree correction with no closed form; the
    per-node ``triangles`` estimate is the supported output.
    ``triangle_count`` remains the exact path.
    """
    if not (0.0 < p <= 1.0):
        raise ValueError("p must be in (0, 1]")
    canon = _canonical_edges(edges, already_undirected)
    res = 1 << 20
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("lo").cast("string"), F.lit("|"),
                           F.col("hi").cast("string"),
                           F.lit(f"#tri{seed}"))), 1, 8), 16, 10
    ).cast("long") % F.lit(res)
    sampled = canon.filter(h < F.lit(int(p * res)))
    exact = triangle_count(
        vertices,
        sampled.select(F.col("lo").alias("src"), F.col("hi").alias("dst")),
        already_undirected=True,
    )
    inv = 1.0 / (p ** 3)
    node_counts = exact.node_counts.select(
        "id",
        (F.col("triangles") * F.lit(inv)).alias("triangles_est"),
        "coefficient",
    )
    return TriangleResult(
        node_counts,
        int(round(exact.triangle_count * inv)),
        exact.average_coefficient,
    )
