"""Degree-preserving null model: configuration-model rewiring.

Motif counts (triangles, butterflies, co-citation weights) are only
meaningful against a baseline — "is 3M triangles a lot for THIS degree
sequence?" The standard answer (Newman, "The structure and function of
complex networks", SIAM Rev. 2003 §4.2.1) is the configuration model:
rewire the graph so every vertex keeps its exact out- and in-degree
while the pairing is randomized, then compare motif counts. The z-score
of the observed count against rewired samples is the significance
statistic.

Distributed, deterministic restatement (no stub list on the driver):

- every edge contributes one OUT-stub (keeps its src) and one IN-stub
  (keeps its dst);
- each stub set gets an independent deterministic pseudo-random total
  order: md5 over (seed, role, src, dst) with the edge itself as the
  collision tiebreaker — the mis.py priority-key trick, identical text
  in both engines;
- stubs are ranked by :func:`..plans.ranking.ranked_prefix_sums`
  (range repartition + per-partition offsets — NO single-partition
  window) and re-paired by global position: new edge i = (src of
  out-stub i, dst of in-stub i).

Every out-degree and in-degree is preserved exactly (each src/dst
occurs exactly as often as before); self-loops and parallel edges can
appear, which is standard for the model (erase or resample per use
case). Different ``seed`` values give independent samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["rewire_configuration_model", "motif_zscore"]


def _stub_key(role: str, seed: int):
    return F.concat(
        F.md5(F.concat_ws("|", F.lit(str(seed)), F.lit(role),
                          F.col("src").cast("string"),
                          F.col("dst").cast("string"))),
        F.lit("-"),
        F.lpad(F.col("src").cast("string"), 12, "0"),
        F.lpad(F.col("dst").cast("string"), 12, "0"),
    )


def rewire_configuration_model(edges: DataFrame, *, seed: int = 42,
                               num_partitions: int | None = None,
                               ) -> DataFrame:
    """One configuration-model sample of the DISTINCT edge set of
    ``edges``: (src, dst) with every vertex's out- and in-degree
    preserved exactly, pairing permuted by the seeded hash order.
    Deterministic in (edge set, seed) — SQL-replayable with the same
    md5 ordering."""
    e = edges.select("src", "dst").distinct()
    from ..plans.ranking import ranked_prefix_sums

    outs = ranked_prefix_sums(
        e.withColumn("_k", _stub_key("out", seed)),
        [F.asc("_k")], rank_col="_r", num_partitions=num_partitions,
    ).select("src", "_r")
    ins = ranked_prefix_sums(
        e.withColumn("_k", _stub_key("in", seed)),
        [F.asc("_k")], rank_col="_r", num_partitions=num_partitions,
    ).select("dst", "_r")
    return outs.join(ins, "_r").select("src", "dst")


def motif_zscore(observed: float, samples: list[float]) -> dict:
    """z-score of an observed motif count against null-model sample
    counts (driver-side scalar arithmetic over a model-sized list)."""
    n = len(samples)
    if n < 2:
        raise ValueError("need >= 2 null-model samples")
    mean = sum(samples) / n
    var = sum((s - mean) ** 2 for s in samples) / (n - 1)
    sd = var ** 0.5
    return {
        "observed": float(observed),
        "null_mean": mean,
        "null_sd": sd,
        "z": (observed - mean) / sd if sd > 0 else float("inf"),
    }
