"""neo4j_graph_algorithms_spark — a from-scratch PySpark-native link-graph
analytics engine with the query capabilities of
knutwalker/neo4j-graph-algorithms (Neo4j graph-algorithms 3.4.12.6).

Not a port: the reference's thread-pool execution machinery
(ParallelUtil / Pools / per-partition int buffers) is replaced by
idiomatic Spark — DataFrame/SQL plans optimized by Catalyst, shuffles as
the message exchange, Arrow-vectorized pandas UDFs for the CSR
gather-scatter kernels, and checkpointed state tables for crash-resume.

Core algorithm surface (reference: algo/**/PageRankProc.java,
UnionFindProc.java, LabelPropagationProc.java, TriangleProc.java):

- :func:`pagerank` / :func:`weighted_pagerank` / personalized PageRank
- :func:`connected_components` (union-find / WCC, weight threshold)
- :func:`label_propagation` (seeded, weighted, directed)
- :func:`triangle_count` + local clustering coefficient
- degree / similarity / link-prediction utilities

plus the training-data pipeline layer (dedup, ANN, text analysis) under
:mod:`neo4j_graph_algorithms_spark.pipeline`.
"""

from neo4j_graph_algorithms_spark.graph import Graph, build_graph, id_map
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
from neo4j_graph_algorithms_spark.operators.wcc import connected_components
from neo4j_graph_algorithms_spark.operators.labelprop import label_propagation
from neo4j_graph_algorithms_spark.operators.triangles import (
    triangle_count,
    triangle_stream,
    clustering_coefficient,
)

__all__ = [
    "Graph",
    "build_graph",
    "id_map",
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangle_stream",
    "clustering_coefficient",
]

__version__ = "0.1.0"
