"""Execution-plan helpers: checkpointed iterative state, skew handling.

The reference drives iterations with thread-pool phases inside one JVM
(core/.../utils/ParallelUtil.java:49-129); its in-memory state dies with
the process. Here every iterative operator runs a driver-side superstep
loop whose state lives in a DataFrame; :mod:`checkpoint` truncates
lineage and persists per-iteration state + metrics so runs are
crash-resumable — a capability the reference does not have.
"""

from neo4j_graph_algorithms_spark.plans.checkpoint import CheckpointManager
from neo4j_graph_algorithms_spark.plans.skew import salted_sum_by_key, split_high_degree

__all__ = ["CheckpointManager", "salted_sum_by_key", "split_high_degree"]
