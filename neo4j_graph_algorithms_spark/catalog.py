"""Named-graph catalog — ``algo.graph.load / remove / info``.

Reference (SURVEY.md §2.1): LoadGraphProc keeps an in-memory
``name → Graph`` map so repeated algorithm calls skip the projection
(algo/.../LoadGraphProc.java:51-152; dispatch
ProcedureConfiguration.java:310-313). The load is idempotent
(LoadGraphProc.java:84-88 returns the cached entry when the name
exists).

Spark restatement: a catalog of persisted vertex/edge DataFrames plus
temp views (`<name>_vertices`, `<name>_edges`), optionally backed by a
durable parquet/Iceberg path so a named graph survives the session
(the reference's cache dies with the JVM — durability is our
checkpoint/resume extension).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

__all__ = ["GraphCatalog", "NamedGraph"]


@dataclass
class NamedGraph:
    name: str
    vertices: DataFrame
    edges: DataFrame
    node_count: int
    edge_count: int
    path: str | None = None


class GraphCatalog:
    """Session-scoped name → graph registry (≡ LoadGraphFactory map)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._graphs: dict[str, NamedGraph] = {}

    def load(self, name: str, vertices: DataFrame, edges: DataFrame, *,
             path: str | None = None,
             storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
             ) -> NamedGraph:
        """Idempotent: an existing name returns the cached graph
        (LoadGraphProc.java:84-88)."""
        if name in self._graphs:
            return self._graphs[name]
        if path is not None:
            vertices.write.parquet(os.path.join(path, "vertices"), mode="overwrite")
            edges.write.parquet(os.path.join(path, "edges"), mode="overwrite")
            vertices = self.spark.read.parquet(os.path.join(path, "vertices"))
            edges = self.spark.read.parquet(os.path.join(path, "edges"))
        v = vertices.persist(storage_level)
        e = edges.persist(storage_level)
        g = NamedGraph(name, v, e, v.count(), e.count(), path)
        v.createOrReplaceTempView(f"{name}_vertices")
        e.createOrReplaceTempView(f"{name}_edges")
        self._graphs[name] = g
        return g

    def get(self, name: str) -> NamedGraph:
        return self._graphs[name]

    def exists(self, name: str) -> bool:
        return name in self._graphs

    def remove(self, name: str) -> bool:
        """≡ algo.graph.remove (LoadGraphProc.java:126-139)."""
        g = self._graphs.pop(name, None)
        if g is None:
            return False
        g.vertices.unpersist()
        g.edges.unpersist()
        self.spark.catalog.dropTempView(f"{name}_vertices")
        self.spark.catalog.dropTempView(f"{name}_edges")
        return True

    def info(self, name: str | None = None) -> list[dict]:
        """≡ algo.graph.info (LoadGraphProc.java:141-152)."""
        names = [name] if name else sorted(self._graphs)
        return [
            {
                "name": g.name,
                "nodes": g.node_count,
                "relationships": g.edge_count,
                "exists": True,
                "durable": g.path is not None,
            }
            for g in (self._graphs[n] for n in names if n in self._graphs)
        ]
