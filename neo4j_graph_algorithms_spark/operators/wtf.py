"""Who-To-Follow: personalized-PageRank circle of trust + SALSA.

Twitter's production recommendation algorithm (Gupta et al., "WTF: The
Who to Follow Service at Twitter", WWW 2013): for a user ``u``,

1. the CIRCLE OF TRUST — the top-k nodes of ``u``'s personalized
   PageRank (the egocentric random walk);
2. a bipartite graph: hubs = circle members, authorities = everyone
   the circle follows;
3. SALSA on that bipartite graph — authority scores are the
   recommendations, hub scores the "users like you" similarity;
4. output: top-n authorities ``u`` does NOT already follow (and not
   ``u``), the actual follow suggestions.

Pure composition of the engine's own operators
(:func:`~...operators.pagerank.pagerank` personalized +
:func:`~...operators.centrality_variants.salsa`) — the value of an
engine whose parts share one data model. The reference has neither
personalization composition nor SALSA (its HITS-adjacent surface stops
at eigenvector centrality).

Scale shape: the PPR pass is a full-graph superstep loop (amortize
across users with
:func:`~...operators.pagerank.pagerank_batch_personalized` — S users
per edge scan); everything downstream is egocentric: the circle is k
rows (broadcast to induce the bipartite edges), the SALSA subgraph is
circle-out-neighborhood-sized. Determinism for the oracle: PPR scores
are rounded to 9 dp before the top-k cut (ties broken by id ASC), same
contract as the tfidf ranking.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = ["who_to_follow", "WtfResult"]


@dataclass
class WtfResult:
    recommendations: DataFrame   # (id, score) — top-n, best first
    circle: DataFrame            # (id, rank)  — the circle of trust
    salsa_scores: DataFrame      # (id, hub, authority) on the subgraph


def who_to_follow(
    vertices: DataFrame,
    edges: DataFrame,
    user: int,
    *,
    circle_k: int = 20,
    ppr_iterations: int = 8,
    salsa_iterations: int = 8,
    top_n: int = 10,
) -> WtfResult:
    """Follow recommendations for ``user`` (see module docstring)."""
    from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
    from neo4j_graph_algorithms_spark.operators.centrality_variants import (
        salsa,
    )

    ppr = pagerank(
        vertices, edges, source_ids=[user],
        max_iterations=ppr_iterations, tol=0.0,
    ).ranks
    circle = (
        ppr.where(F.col("id") != user)
        .select("id", F.round("rank", 9).alias("rank"))
        .where(F.col("rank") > 0.0)
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(circle_k)
    )
    hubs = circle.select(F.col("id").alias("src"))
    sub_edges = edges.join(F.broadcast(hubs), "src").select("src", "dst")
    sub_vertices = (
        sub_edges.select(F.col("src").alias("id"))
        .union(sub_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    sal = salsa(sub_vertices, sub_edges,
                max_iterations=salsa_iterations, tol=0.0)
    followed = edges.where(F.col("src") == user) \
        .select(F.col("dst").alias("id")).distinct()
    recs = (
        sal.scores
        .where(F.col("id") != user)
        .join(F.broadcast(followed), "id", "left_anti")
        .select("id", F.round("authority", 9).alias("score"))
        .where(F.col("score") > 0.0)
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(top_n)
    )
    return WtfResult(recommendations=recs, circle=circle,
                     salsa_scores=sal.scores)
