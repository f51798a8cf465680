"""Label propagation — synchronous, weighted, seeded.

Semantics from ``algo.labelPropagation`` (reference:
algo/.../LabelPropagationProc.java:54-57 defaults; impl
algo/.../impl/LabelPropagation.java):

- seed label = the node's ``partition`` property when present, else the
  node's own id (LabelPropagation.java:221-228);
- a node gathers votes over its relationships in the configured
  direction: ``votes[label(nbr)] += edgeWeight(v,nbr) · nodeWeight(nbr)``
  (LabelPropagation.java:310-319), then adopts the argmax label
  (:290-308);
- stops when an iteration changes no label, or at ``max_iterations``;
  reports ``ran_iterations`` / ``did_converge``
  (LabelPropagation.java:127-154).

DOCUMENTED DEVIATION (SURVEY.md §2.3): the reference updates labels
asynchronously in randomized order with hash-map-order tie-breaking —
explicitly nondeterministic (LabelPropagation.java:268,296-301,335-389;
its own test comments acknowledge oscillation,
tests/.../LabelPropagation420Test.java:61-81). This engine runs a
**red-black semi-synchronous** variant with a deterministic tie-break
(highest vote, then smallest label): each iteration updates the even-id
class first, then the odd-id class against the refreshed labels — a
deterministic Gauss-Seidel sweep that kills the pure-sync 2-cycle
oscillation (mutually-following node pairs flipping forever) the same
way the reference's async order does, while remaining two set-oriented
join+agg jobs per iteration. Results are reproducible; equality with
the reference is asserted on converged fixtures (community partitions),
as the reference's tests themselves do.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.plans.checkpoint import CheckpointManager
from neo4j_graph_algorithms_spark.plans.loop_conf import superstep_conf

__all__ = ["label_propagation", "LabelPropagationResult"]


@dataclass
class LabelPropagationResult:
    labels: DataFrame  # (id: long, label: long)
    ran_iterations: int
    did_converge: bool
    metrics: list[dict[str, Any]] = field(default_factory=list)


def label_propagation(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_iterations: int = 10,
    direction: str = "out",
    partition_col: str | None = "partition",
    node_weight_col: str | None = "weight",
    min_iterations: int = 0,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    edges_prelayout: bool = False,
    spark: SparkSession | None = None,
) -> LabelPropagationResult:
    """Run synchronous LPA.

    ``direction``: which neighbors a node listens to — ``out`` gathers
    from its out-neighbors (the reference's OUTGOING,
    LabelPropagation.java:310-319 iterates v's out-relationships and
    reads the *target*'s label), ``in`` from in-neighbors, ``both`` from
    all. ``min_iterations`` forces at least that many rounds even after
    convergence (used for fixed-k oracle comparison; a converged sync
    LPA state is a fixed point, so extra rounds are no-ops).

    ``edges_prelayout``: set when ``edges`` comes from a bucketed+sorted
    table (``sources.bucketed.write_edges_bucketed``) whose bucket key
    is this run's GATHER endpoint — the neighbor whose label is read:
    ``dst`` for ``direction='out'``, ``src`` for ``'in'``. The stored
    layout then replaces the per-run repartition+sort, so edge rows are
    never shuffled; per round only the vertex-sized label table moves.
    ``direction='both'`` unions the two orientations (destroying any
    single-key layout) — for undirected gather over a prelayout table,
    write it with ``symmetrize=True`` and run ``direction='in'``, which
    reads every neighbor exactly once.
    """
    spark = spark or vertices.sparkSession

    # (v listens_to u) pairs with the edge weight of the relationship.
    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    out_pairs = edges.select(F.col("src").alias("v"), F.col("dst").alias("u"),
                             w.alias("ew"))
    in_pairs = edges.select(F.col("dst").alias("v"), F.col("src").alias("u"),
                            w.alias("ew"))
    if direction == "out":
        pairs = out_pairs
    elif direction == "in":
        pairs = in_pairs
    else:
        if edges_prelayout:
            raise ValueError(
                "edges_prelayout supports direction 'out'/'in' only — the "
                "'both' union destroys any single-key storage layout; for "
                "undirected gather write the table with symmetrize=True "
                "and run direction='in'")
        pairs = out_pairs.union(in_pairs)

    # Node weights (LabelPropagation's "weight" property, default 1.0).
    # All-default weights skip the join outright: vote_w == ew.
    if node_weight_col and node_weight_col in vertices.columns:
        nw = vertices.select(
            F.col("id").alias("u"),
            F.coalesce(F.col(node_weight_col).cast("double"), F.lit(1.0)).alias("nw"),
        )
        pairs = pairs.join(nw, "u", "left").na.fill({"nw": 1.0})
        pairs = pairs.withColumn("vote_w", F.col("ew") * F.col("nw"))
    else:
        pairs = pairs.withColumn("vote_w", F.col("ew"))
    pairs = pairs.select("v", "u", "vote_w")
    if edges_prelayout:
        # the scan is bucketed+sorted on the gather endpoint (aliased to
        # ``u``); select/filter/withColumn above are narrow, so the
        # layout survives to here. Same two planner subtleties as
        # pagerank/wcc's prelayout branches: pin bucketed reading ON for
        # the cache build and re-assert the files' sort order (narrow)
        # at the cache boundary.
        auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        prev_auto = spark.conf.get(auto_key, "true")
        spark.conf.set(auto_key, "false")
        try:
            pairs = pairs.sortWithinPartitions("u").persist()
            pairs.count()
        finally:
            spark.conf.set(auto_key, prev_auto)
    else:
        # pre-partition + pre-sort on the gather key: the per-round votes
        # join streams the cached pairs with no exchange/re-sort
        pairs = pairs.repartition("u").sortWithinPartitions("u").persist()
        pairs.count()

    # Seed labels: partition property else own id (LabelPropagation.java:221-228).
    if partition_col and partition_col in vertices.columns:
        labels = vertices.select(
            "id",
            F.coalesce(F.col(partition_col).cast("long"), F.col("id")).alias("label"),
        )
    else:
        labels = vertices.select("id", F.col("id").alias("label"))

    ckpt = CheckpointManager(spark, checkpoint_dir, checkpoint_interval,
                             algorithm="labelprop")
    resumed = ckpt.resume()
    if resumed is not None:
        start_it, labels = resumed
    else:
        start_it = 0

    did_converge = False
    it = start_it
    argmax_w = Window.partitionBy("v").orderBy(
        F.desc("votes"), F.asc("label")
    )

    def _phase(labels_df, parity):
        """Update the listener class ``id % 2 == parity`` against the
        current labels; other class passes through unchanged."""
        votes = (
            pairs.filter(F.pmod(F.col("v"), F.lit(2)) == parity)
            .join(labels_df.select(F.col("id").alias("u"),
                                   F.col("label")), "u")
            .groupBy("v", "label")
            .agg(F.sum("vote_w").alias("votes"))
        )
        winners = (
            votes.withColumn("_rn", F.row_number().over(argmax_w))
            .filter(F.col("_rn") == 1)
            .select(F.col("v").alias("id"), F.col("label").alias("_new"))
        )
        return (
            labels_df.join(winners, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("_new"), F.col("label")).alias("label"),
                *([F.col("_prev")] if "_prev" in labels_df.columns else []),
            )
        )

    with superstep_conf(spark, vertices.count()):
        for it in range(start_it + 1, max_iterations + 1):
            base = labels.select("id", "label", F.col("label").alias("_prev"))
            red = _phase(base, 0)       # even ids see last iteration's labels
            new_labels = _phase(red, 1)  # odd ids see the refreshed even labels
            new_labels, info = ckpt.maybe_checkpoint(
                new_labels, it,
                action=lambda df: {
                    "changed": df.filter(F.col("label") != F.col("_prev")).count()
                },
            )
            changed = info["changed"]
            labels = new_labels.select("id", "label")
            if changed == 0 and it >= min_iterations:
                did_converge = True
                break


    pairs.unpersist()
    return LabelPropagationResult(labels, it, did_converge, list(ckpt.metrics))
