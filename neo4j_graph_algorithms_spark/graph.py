"""Graph data model: two DataFrames instead of the reference's in-memory CSR.

The reference materializes a ``Graph`` = IdMap + adjacency arrays (+ weights)
per run (reference: core/src/main/java/org/neo4j/graphalgo/api/Graph.java:27-38,
core/.../core/IdMap.java:39-131, core/.../heavyweight/AdjacencyMatrix.java:47-118).
Here a graph is:

- ``vertices``: ``(id: long, …optional props)`` — one row per node
- ``edges``:    ``(src: long, dst: long, weight: double)`` — deduplicated

Graph semantics preserved from the reference (SURVEY.md §1.4):

1. Direction handling: OUT / IN / BOTH; ``asUndirected`` merges both
   directions into one out-adjacency (GraphSetup.java:83-84,136-137).
2. Deduplication: the huge loader sorts + delta-encodes + drops duplicate
   targets (core/.../huge/loader/AdjacencyCompression.java:66-77); the
   Cypher loader supports NONE/SKIP/SUM/MIN/MAX duplicate strategies
   (core/.../core/DuplicateRelationshipsStrategy.java:8-67).
3. Self-loops survive dedup (AdjacencyCompression.java:30-33).
4. Edges with endpoints outside the projected node set are dropped
   (core/.../heavyweight/VisitRelationship.java:79-82).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = ["Graph", "build_graph", "id_map", "dedup_edges", "as_undirected", "degrees"]


def id_map(edges: DataFrame, vertices: DataFrame | None = None,
           node_col: str = "name") -> DataFrame:
    """Dense id dictionary: arbitrary node keys → consecutive longs [0, n).

    The reference's IdMap densely remaps arbitrary Neo4j long ids to
    consecutive ints in insertion order (core/.../core/IdMap.java:39-89).
    Spark-side we derive the node universe from the edge endpoints (plus an
    optional explicit vertex table) and assign dense ids with a global
    ``row_number`` over a deterministic sort — a one-time O(n log n) job
    whose output is persisted and reused, so ids are stable across runs.

    Returns ``(name, id)`` where ``id`` is dense long.
    """
    nodes = edges.select(F.col("src").alias(node_col)).union(
        edges.select(F.col("dst").alias(node_col))
    )
    if vertices is not None:
        nodes = nodes.union(vertices.select(F.col(node_col)))
    nodes = nodes.distinct()
    # zipWithIndex keeps this a single pass without a single-partition
    # window; ordering first makes the assignment deterministic.
    ordered = nodes.orderBy(node_col)
    out = (
        ordered.rdd.map(lambda r: r[0])
        .zipWithIndex()
        .toDF([node_col, "id"])
        .select(F.col(node_col), F.col("id").cast("long"))
    )
    return out


def dedup_edges(edges: DataFrame, strategy: str = "skip") -> DataFrame:
    """Deduplicate parallel edges.

    Mirrors DuplicateRelationshipsStrategy (reference:
    core/.../core/DuplicateRelationshipsStrategy.java:8-67):
    ``skip`` keeps the first/any weight, ``sum``/``min``/``max`` combine
    weights, ``none`` keeps parallel edges (the projected model itself
    never does — readme.adoc "only one relationship between a pair of
    nodes per direction").
    """
    strategy = strategy.lower()
    if strategy == "none":
        return edges
    if "weight" not in edges.columns:
        return edges.dropDuplicates(["src", "dst"])
    agg = {
        "skip": F.first("weight"),
        "sum": F.sum("weight"),
        "min": F.min("weight"),
        "max": F.max("weight"),
    }[strategy]
    return edges.groupBy("src", "dst").agg(agg.alias("weight"))


def as_undirected(edges: DataFrame) -> DataFrame:
    """Merge both directions into a single out-adjacency.

    ≡ ``GraphSetup.loadAsUndirected`` (reference: api/GraphSetup.java:83-84;
    HeavyGraphFactory.java:65-71): every edge becomes visible from both
    endpoints, then duplicates collapse. Self-loops are kept once.
    """
    cols = edges.columns
    flipped = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        *[F.col(c) for c in cols if c not in ("src", "dst")]
    )
    return dedup_edges(edges.select(*cols).union(flipped.select(*cols)), "skip")


def degrees(edges: DataFrame, direction: str = "out",
            weighted: bool = False) -> DataFrame:
    """Degree table ``(id, degree)`` — ≡ Degrees API / DegreeCentrality
    (reference: api/Degrees.java; algo/.../impl/degree/DegreeCentrality.java).
    """
    key = {"out": "src", "in": "dst"}[direction]
    g = edges.groupBy(F.col(key).alias("id"))
    if weighted:
        return g.agg(F.sum("weight").alias("degree"))
    return g.agg(F.count(F.lit(1)).cast("double").alias("degree"))


@dataclass
class Graph:
    """A projected graph: vertex + deduplicated edge DataFrames.

    ``vertices``: (id: long[, partition: long, weight: double, …])
    ``edges``:    (src: long, dst: long[, weight: double])
    """

    vertices: DataFrame
    edges: DataFrame

    def out_degrees(self, weighted: bool = False) -> DataFrame:
        return degrees(self.edges, "out", weighted)

    def in_degrees(self, weighted: bool = False) -> DataFrame:
        return degrees(self.edges, "in", weighted)

    def undirected(self) -> "Graph":
        return Graph(self.vertices, as_undirected(self.edges))

    def reversed(self) -> "Graph":
        cols = self.edges.columns
        rev = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            *[F.col(c) for c in cols if c not in ("src", "dst")]
        )
        return Graph(self.vertices, rev.select(*cols))

    def persist(self) -> "Graph":
        self.vertices.persist()
        self.edges.persist()
        return self

    def unpersist(self) -> "Graph":
        self.vertices.unpersist()
        self.edges.unpersist()
        return self


def build_graph(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    *,
    duplicate_strategy: str = "skip",
    undirected: bool = False,
    direction: str = "out",
    default_weight: float | None = None,
) -> Graph:
    """Project an edge list into a :class:`Graph`.

    Steps mirror the reference loaders (SURVEY.md §2.1):

    - duplicate-edge resolution (``duplicate_strategy``)
    - direction selection: ``out`` keeps (src,dst), ``in`` flips,
      ``both``/``undirected=True`` merges (Directions / loadAsUndirected)
    - missing-endpoint filtering when an explicit vertex table is given
      (VisitRelationship.java:79-82 — idMap miss drops the edge)
    - default weight fill (GraphSetup.java:56-64 property defaults)

    All of this is a declarative plan — Catalyst prunes columns and pushes
    the endpoint semi-joins into the scan.
    """
    cols = ["src", "dst"] + (["weight"] if "weight" in edges.columns else [])
    e = edges.select(*cols)
    if default_weight is not None:
        if "weight" in e.columns:
            e = e.withColumn("weight", F.coalesce(F.col("weight"), F.lit(float(default_weight))))
        else:
            e = e.withColumn("weight", F.lit(float(default_weight)))

    if vertices is not None:
        ids = vertices.select("id")
        # Semi-joins; the vertex dictionary is typically much smaller than
        # the edge table — let AQE/broadcast pick the strategy.
        e = e.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
        e = e.join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        e = e.select(*[c for c in cols if c in e.columns] +
                     (["weight"] if "weight" in e.columns and "weight" not in cols else []))

    if direction == "in":
        rest = [c for c in e.columns if c not in ("src", "dst")]
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), *rest)

    if undirected or direction == "both":
        e = as_undirected(e)
    else:
        e = dedup_edges(e, duplicate_strategy)

    if vertices is None:
        vertices = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    return Graph(vertices, e)
