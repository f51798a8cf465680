"""HyperBall: approximate neighborhood function / centralities via HLL.

The reference computes closeness-family centralities by exact
multi-source BFS (impl/msbfs/MultiSourceBFS.java,
impl/closeness/MSClosenessCentrality.java:49-57) — O(V·reach) state
that no engine can afford at 10^12 edges. The published scale answer is
HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
Centralities with HyperBall", 2013; HyperANF, WWW 2011): keep one
HyperLogLog sketch per vertex estimating |ball(v, r)| and update it
with one elementwise-max gather per radius step. This module is that
algorithm restated as DataFrame rounds:

- sketch state: ``m = 2^b`` registers held as ``m`` integer COLUMNS
  (``r0..r{m-1}``) so the per-round merge is a plain
  ``groupBy(src).agg(max(r_j)...)`` — all-JVM, whole-stage-codegen,
  map-side partial aggregation for free. No arrays, no UDFs.
- per round: join edges to the neighbor's registers (edge side
  pre-partitioned + sorted on the gather key once, persisted — only the
  vertex-sized register table moves per round, the same superstep shape
  as pagerank/wcc), gather elementwise max per origin, fold into the
  current registers with ``greatest``.
- estimate: standard HLL raw estimate ``alpha_m * m^2 / sum(2^-r_j)``
  with the small-range linear-counting correction. Register sums are
  dyadic rationals (exact in doubles), so the estimate is reproducible
  bit-for-bit across engines — the driver oracle replays it in DuckDB
  down to the Murmur3 bits.

State is |V| x (m+1) ints — at 10^10 vertices and m=64 that is ~2.5 TB
spread across the cluster, shuffled once per radius step: feasible where
exact MS-BFS (O(V^2) pairs) is not. Relative error 1.04/sqrt(m)
(m=64 -> 13%, m=256 -> 6.5%). Registers are derived from a 32-bit
Murmur3 hash (Spark's ``F.hash``): fine to ~10^8 distinct ball members
per vertex; beyond that the 32-bit hash itself saturates (documented
limit of this sandbox restatement; production would swap in a 64-bit
hash, same plan shape).

``direction='out'`` estimates |{u reachable FROM v within r}| (gather
over out-edges), ``'in'`` the co-ball, ``'both'`` treats edges as
undirected (gathers over both orientations).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.loop_conf import superstep_conf

__all__ = [
    "hyperball",
    "approx_neighborhood_function",
    "approx_effective_diameter",
    "approx_eccentricity",
    "closeness_hyperball",
    "hll_alpha",
    "hll_estimate_sql",
]

# F.hash(id, lit(HASH_SALT1), lit(HASH_SALT2)) is the register source;
# the DuckDB oracle replays the same Murmur3_x86_32 chain bit-for-bit.
HASH_SALT1 = 7
HASH_SALT2 = 13
_U32 = 1 << 32


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant (Flajolet et al. 2007, fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate_sql(m: int, prefix: str = "") -> str:
    """One SQL expression (valid in both Spark SQL and DuckDB) turning
    register columns ``{prefix}r0..r{m-1}`` into the HLL cardinality
    estimate. Shared text => bit-identical arithmetic order in both
    engines (the 2^-r sum is a sum of dyadic rationals — exact)."""
    regs = [f"{prefix}r{j}" for j in range(m)]
    sum_inv = " + ".join(f"POWER(2.0, -{r})" for r in regs)
    zeros = " + ".join(f"(CASE WHEN {r} = 0 THEN 1 ELSE 0 END)" for r in regs)
    alpha = hll_alpha(m)
    # CAST the literals: DuckDB parses bare 0.673 as DECIMAL and would
    # route the arithmetic through decimal, diverging from Spark's double
    raw = f"(CAST({alpha!r} AS DOUBLE) * {m} * {m} / ({sum_inv}))"
    return (
        f"(CASE WHEN {raw} <= CAST(2.5 AS DOUBLE) * {m} AND ({zeros}) > 0 "
        f"THEN {m} * LN(CAST({m} AS DOUBLE) / ({zeros})) "
        f"ELSE {raw} END)"
    )


def _init_registers(vertices: DataFrame, b: int) -> DataFrame:
    """(id, r0..r{m-1}): singleton sketch {v} per vertex v.

    j = u mod m picks the register, rho = 1 + (trailing zeros of
    u >> b) marks it; u is the unsigned 32-bit Murmur3 of the id.
    ctz via log2(w & -w) — exact for powers of two."""
    m = 1 << b
    u = F.pmod(
        F.hash(F.col("id"), F.lit(HASH_SALT1), F.lit(HASH_SALT2)).cast("long"),
        F.lit(_U32),
    )
    df = vertices.select("id").withColumn("_u", u)
    df = df.withColumn("_j", (F.col("_u") % m).cast("int"))
    w = (F.col("_u") / m).cast("long")  # u >> b
    rho = F.when(w == 0, F.lit(32 - b + 1)).otherwise(
        F.log2(w.bitwiseAND(-w)).cast("int") + 1
    )
    df = df.withColumn("_rho", rho)
    cols = [F.col("id")] + [
        F.when(F.col("_j") == j, F.col("_rho")).otherwise(F.lit(0))
        .cast("int").alias(f"r{j}")
        for j in range(m)
    ]
    return df.select(*cols)


@dataclass
class HyperBallResult:
    balls: DataFrame      # (id, r, ball_est) for r = 0..radius
    registers: DataFrame  # final (id, r0..r{m-1})
    radius: int
    b: int


def hyperball(
    vertices: DataFrame,
    edges: DataFrame,
    radius: int = 8,
    b: int = 6,
    direction: str = "out",
    spark: SparkSession | None = None,
) -> HyperBallResult:
    """Run ``radius`` HyperBall rounds; ``balls`` holds the estimated
    |ball(v, r)| for every vertex and every r (r=0 is the singleton,
    estimated through the same sketch so the series is self-consistent).
    """
    if not 2 <= b <= 8:
        raise ValueError("b must be in [2, 8] (m = 4..256 register columns)")
    m = 1 << b
    spark = spark or vertices.sparkSession

    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if direction == "out":
        pairs = e.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    elif direction == "in":
        pairs = e.select(F.col("dst").alias("v"), F.col("src").alias("u"))
    elif direction == "both":
        pairs = e.select(F.col("src").alias("v"), F.col("dst").alias("u")).union(
            e.select(F.col("dst").alias("v"), F.col("src").alias("u"))
        ).dropDuplicates(["v", "u"])
    else:
        raise ValueError(f"direction must be out/in/both, got {direction!r}")

    # superstep shape: edge side laid out once on the neighbor key (the
    # per-round join key), vertex-sized registers the only moving side
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    pairs = (
        pairs.repartition(shuffle_n, "u").sortWithinPartitions("u").persist()
    )
    pairs.count()

    regs = _init_registers(vertices, b).persist()
    n_vertices = regs.count()
    est = F.expr(hll_estimate_sql(m)).alias("ball_est")
    out = [regs.select("id", F.lit(0).alias("r"), est)]

    reg_cols = [f"r{j}" for j in range(m)]
    # same loop policy as the pagerank superstep (plans/loop_conf.py):
    # AQE off (static shapes, re-planning latency dominates), broadcast
    # off above the threshold (the register table is the EVOLVING side —
    # broadcasting |V| x (m+1) ints per round would be a driver build
    # per round)
    with superstep_conf(spark, n_vertices):
        for it in range(1, radius + 1):
            nbr = regs.select(
                F.col("id").alias("u"),
                *[F.col(c).alias(f"n{j}") for j, c in enumerate(reg_cols)],
            )
            gath = (
                pairs.join(nbr, "u")
                .groupBy("v")
                .agg(*[F.max(f"n{j}").alias(f"m{j}") for j in range(m)])
            )
            new_regs = (
                regs.join(gath, regs.id == gath.v, "left")
                .select(
                    "id",
                    *[
                        F.greatest(F.col(c),
                                   F.coalesce(F.col(f"m{j}"), F.lit(0)))
                        .alias(c)
                        for j, c in enumerate(reg_cols)
                    ],
                )
                .localCheckpoint(eager=False)  # truncate lineage per round
                .persist()
            )
            new_regs.count()
            regs.unpersist()
            regs = new_regs
            out.append(regs.select("id", F.lit(it).alias("r"), est))

    balls = out[0]
    for o in out[1:]:
        balls = balls.unionByName(o)
    pairs.unpersist()
    return HyperBallResult(balls=balls, registers=regs, radius=radius, b=b)


def approx_neighborhood_function(balls: DataFrame) -> DataFrame:
    """HyperANF: (r, anf) — expected #reachable pairs within distance r,
    the sum of every vertex's ball estimate."""
    return balls.groupBy("r").agg(F.sum("ball_est").alias("anf")).orderBy("r")


def approx_effective_diameter(
    balls: DataFrame, alpha: float = 0.9
) -> DataFrame:
    """Interpolated effective diameter: smallest r (linearly interpolated
    between integer radii, HyperANF §5) where anf(r) >= alpha * anf(R).
    One row: (effective_diameter). Run with radius comfortably past the
    expected diameter so anf(R) has plateaued."""
    from pyspark.sql.window import Window

    anf = approx_neighborhood_function(balls)
    w = anf.select(
        "r",
        "anf",
        F.lag("anf").over(Window.orderBy("r")).alias("prev"),
        F.max("anf").over(
            Window.orderBy("r").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("total"),
    )
    hit = (
        w.filter(F.col("anf") >= alpha * F.col("total"))
        .orderBy("r")
        .limit(1)
        .select(
            F.when(
                F.col("prev").isNull() | (F.col("anf") <= F.col("prev")),
                F.col("r").cast("double"),
            )
            .otherwise(
                F.col("r") - 1
                + (alpha * F.col("total") - F.col("prev"))
                / (F.col("anf") - F.col("prev"))
            )
            .alias("effective_diameter")
        )
    )
    return hit


def approx_eccentricity(balls: DataFrame) -> DataFrame:
    """Approximate per-vertex eccentricity from the HyperBall sketch
    (HyperANF §5 uses the same plateau idea graph-wide for the
    diameter): ``ecc(v)`` = the smallest radius whose ball estimate
    equals the final (radius-R) estimate — where v's sketch first
    reports its final ball size. On a collision-free sketch (small
    balls / linear-counting regime) this IS the exact eccentricity
    within the run's radius bound; with register collisions it can
    under-report (a new shell that changes no register is invisible) —
    the usual HLL trade. Run with ``radius`` comfortably past the
    expected diameter, else values truncate at R.

    Defined via double EQUALITY of the deterministic estimate (the
    sketch replay is bit-exact cross-engine), not monotonicity — the
    linear-counting→raw-estimate switch makes the series technically
    non-monotone at the regime boundary.

    Returns ``(id, ecc, reach)``; ``reach`` = final ball estimate
    rounded to 6 decimals. Radius = ``min(ecc)``, diameter ≈
    ``max(ecc)`` over any strongly-reachable vertex set.

    Plan note: when the caller feeds ``balls`` lazily (estimate column
    still the inlined m-term HLL expression), the hash-agg stage here
    can exceed Janino's 64 KB per-method limit at m ≥ 16 and Spark
    falls back to interpreted evaluation for that ONE stage (logged as
    ``ERROR CodeGenerator`` + a clean fallback) — correctness is
    unaffected and the stage is vertex-sized (one pass over |V|·R
    rows), so the ~2x interpreted penalty is noise next to the gather
    rounds. Materializing ``balls`` first restores codegen if that
    pass ever matters.
    """
    from pyspark.sql.window import Window

    wv = Window.partitionBy("id")
    mx = balls.withColumn("_rmax", F.max("r").over(wv))
    fin = (
        mx.filter(F.col("r") == F.col("_rmax"))
        .select("id", F.col("ball_est").alias("_fin"))
    )
    return (
        balls.join(fin, "id")
        .filter(F.col("ball_est") == F.col("_fin"))
        .groupBy("id")
        .agg(
            F.min("r").cast("int").alias("ecc"),
            F.round(F.max("_fin"), 6).alias("reach"),
        )
    )


def closeness_hyperball(
    balls: DataFrame, wasserman_faust: bool = False
) -> DataFrame:
    """Approximate closeness (and harmonic) centrality from ball sizes
    (HyperBall §3): the #nodes at distance exactly r from v is
    ball(v,r) - ball(v,r-1), so farness(v) = sum r * (ball_r - ball_{r-1})
    and reach(v) = ball(v, R). Mirrors the reference's
    centrality = component/farness (MSBFSCCAlgorithm.java:49-57) with
    component counting reachable nodes EXCLUDING self (the ball includes
    v, so component = ball(v,R) - 1), zero farness -> 0;
    ``wasserman_faust`` applies the same (component-1)/(n-1) factor as
    closeness_centrality's improved=true. Returns
    (id, reach, farness, closeness, harmonic) — reach excludes self to
    match the exact operator's component column."""
    from pyspark.sql.window import Window

    wv = Window.partitionBy("id").orderBy("r")
    d = balls.select(
        "id",
        "r",
        (F.col("ball_est") - F.coalesce(F.lag("ball_est").over(wv), F.lit(0.0)))
        .alias("shell"),
        "ball_est",
    )
    n_total = balls.select("id").distinct().count()
    agg = d.groupBy("id").agg(
        F.max("ball_est").alias("_ball"),
        F.sum(F.when(F.col("r") > 0, F.col("r") * F.col("shell"))
              .otherwise(0.0)).alias("farness"),
        F.sum(F.when(F.col("r") > 0, F.col("shell") / F.col("r"))
              .otherwise(0.0)).alias("harmonic_raw"),
    )
    # ball includes v itself; the exact operator's component excludes it
    component = F.greatest(F.col("_ball") - 1.0, F.lit(0.0))
    clo = F.when(F.col("farness") <= 0.0, F.lit(0.0)).otherwise(
        component / F.col("farness")
    )
    if wasserman_faust:
        clo = clo * (component - 1) / F.lit(float(max(n_total - 1, 1)))
    return agg.select(
        "id",
        component.alias("reach"),
        "farness",
        clo.alias("closeness"),
        (F.col("harmonic_raw") / F.lit(float(max(n_total - 1, 1))))
        .alias("harmonic"),
    )
