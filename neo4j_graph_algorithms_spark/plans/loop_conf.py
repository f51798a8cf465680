"""Session tuning for iterative superstep loops.

Adaptive Query Execution re-plans every exchange at runtime. For one-off
analytic queries that's free insurance; inside a superstep loop it is a
per-iteration DRIVER cost on stages whose shapes never change between
iterations (the edge side is persisted and static, the rank/label side
is always vertex-sized). Measured on the bench graph (2.7M edges,
local[32]): 2.28 s/superstep with AQE vs 0.93 s without — the re-planning
latency dominates and, worse, AQE's partition coalescing collapses the
vertex-sized exchange to one partition, serializing the reduce stage.

``superstep_conf`` turns AQE off for the duration of a driver loop and
restores the previous setting afterwards. On a real multi-executor
cluster at 100 TB the per-stage work is large enough that re-planning
latency amortizes; re-enable with
``SPARK_GRAFT_LOOP_AQE=1`` (skew-join splitting may then help power-law
dst skew, though the map-side partial aggregation already combines hub
keys before the shuffle).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

__all__ = ["superstep_conf"]

_AQE = "spark.sql.adaptive.enabled"
_BCAST = "spark.sql.autoBroadcastJoinThreshold"


@contextmanager
def superstep_conf(spark: SparkSession):
    """AQE off + auto-broadcast off for the loop body.

    Broadcast-off because the evolving state table is vertex-sized:
    broadcasting it per superstep serializes a driver-side collect+build
    every iteration (measured slower than SMJ beyond ~10^5 vertices),
    while the SMJ alternative streams the pre-sorted cached big side
    with no exchange at all.
    """
    if os.environ.get("SPARK_GRAFT_LOOP_AQE") == "1":
        yield
        return
    prev_aqe = spark.conf.get(_AQE, "true")
    prev_bcast = spark.conf.get(_BCAST, "10485760b")
    spark.conf.set(_AQE, "false")
    spark.conf.set(_BCAST, "-1")
    try:
        yield
    finally:
        spark.conf.set(_AQE, prev_aqe)
        spark.conf.set(_BCAST, prev_bcast)
