"""Fiedler-vector spectral bisection, exact-integer power iteration.

The algebraic-connectivity eigenvector (Fiedler 1973) is the classic
global graph partitioner: the sign pattern of the Laplacian's
second-smallest eigenvector splits the graph along its sparsest "bottle
neck" (Shi–Malik normalized-cut lineage). Downstream of a link graph it
answers "where does this community naturally split" — the complement of
the LOCAL sweep-cut operator (``sweepcut.py``), which grows one seed
community; Fiedler bisects globally with no seed.

Power iteration runs on the shifted matrix ``M = σI − L`` (σ = 2·dmax ≥
λ_max, so M is PSD and eigenvalues reverse order); M's top eigenvector
is the all-ones vector, so each round DEFLATES it by re-centering. All
arithmetic is engine-exact integer, the ``eigencent.py`` contract
extended with sign-safe divisions (Spark ``div`` truncates toward zero
while DuckDB ``//`` floors — they disagree on negatives, so every
division here wraps in CASE-on-sign and divides magnitudes):

    y_k(v) = (σ − deg v)·x_{k-1}(v) + Σ_{u~v} x_{k-1}(u)   (BIGINT)
    z_k(v) = y_k(v) − tdiv(Σ_u y_k(u), n)                  (deflate 1)
    m_k    = max_v |z_k(v)|
    x_k(v) = sgn(z)·((|z_k(v)|·S) div m_k)                 (rescale)

The truncated mean leaves a sub-1-per-entry ones-residual each round;
it is re-subtracted next round, so it never accumulates — and both
engines compute the identical sequence bit-for-bit. Initial ``x_0`` is
the centered ``md5_num60(vid) % S`` — deterministic, reproducible on
retry, and (unlike a constant) not orthogonal to the Fiedler
direction. Overflow envelope: |y| ≤ 3·dmax·S, the rescale multiplies
|z| ≤ 6·dmax·S by S — int64-safe for dmax ≤ ~1.5·10⁶ at S = 10⁶; both
engines fail loudly beyond (DuckDB via HUGEINT mismatch, Spark via
overflow under ANSI sums).

Scale shape per round: ONE ``groupBy(dst)`` shuffle with map-side
partial sums over the persisted symmetric edge table, state joins under
the shared ``state_hint`` policy, two 1-row scalar aggregates folded by
broadcast cross-join (the sanctioned Q11 idiom), ``localCheckpoint``
per round. Reference builds the influence graph and stops
(``reconstruct.rs:37-134``); partitioning it is downstream analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.functions import md5_num60
from crgp_spark.plans.superstep import state_hint

__all__ = ["fiedler_vector"]


def _tdiv(num, den):
    """Truncation-toward-zero integer division, identical in Spark and
    DuckDB for any sign: divide magnitudes, reapply the sign."""
    mag = F.expr(f"abs({num}) div {den}")
    return F.when(F.expr(num) < 0, -mag).otherwise(mag)


def fiedler_vector(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 4,
    scale: int = 1_000_000,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Returns ``(vid, f_scaled, side)`` over the symmetrized simple
    graph after ``rounds`` exact-integer deflated power-iteration
    rounds: ``f_scaled`` is the iterate in ``[-scale, scale]``,
    ``side = 1`` where it is ≥ 0 else 0 — the spectral bisection."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    cfg = cfg or EngineConfig()
    fwd = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition(cfg.shuffle_partitions, "src")
        .persist()
    )
    deg = (
        sym.groupBy(F.col("src").alias("vid"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()
    sig = deg.agg((F.lit(2) * F.max("deg")).cast("long").alias("_sig"))

    # x0: centered deterministic hash in [0, scale)
    h = deg.select(
        "vid", (md5_num60(F.col("vid").cast("string")) % scale).alias("h")
    )
    sh = h.agg(F.sum("h").alias("_sh"))
    x = (
        h.crossJoin(F.broadcast(sh))
        .select(
            "vid",
            (F.col("h") - F.expr(f"_sh div CAST({n} AS BIGINT)"))
            .cast("long")
            .alias("x"),
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(rounds):
        xv = state_hint(
            x.select(F.col("vid").alias("src"), F.col("x").alias("xs")), n
        )
        msg = (
            sym.join(xv, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("xs").alias("_s"))
        )
        y = (
            deg.join(state_hint(x, n), "vid")
            .join(state_hint(msg, n), "vid", "left")
            .crossJoin(F.broadcast(sig))
            .select(
                "vid",
                (
                    (F.col("_sig") - F.col("deg")) * F.col("x")
                    + F.coalesce(F.col("_s"), F.lit(0))
                )
                .cast("long")
                .alias("y"),
            )
        )
        sy = y.agg(F.sum("y").alias("_sy"))
        z = y.crossJoin(F.broadcast(sy)).select(
            "vid",
            (F.col("y") - _tdiv("_sy", f"CAST({n} AS BIGINT)"))
            .cast("long")
            .alias("z"),
        )
        m = z.agg(F.max(F.abs(F.col("z"))).alias("_m"))
        x = (
            z.crossJoin(F.broadcast(m))
            .select(
                "vid",
                F.when(F.col("_m") <= 0, F.lit(0))
                .otherwise(_tdiv(f"z * CAST({scale} AS BIGINT)", "_m"))
                .cast("long")
                .alias("x"),
            )
            .localCheckpoint(eager=True)
        )

    out = x.select(
        "vid",
        F.col("x").alias("f_scaled"),
        F.when(F.col("x") >= 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("side"),
    )
    sym.unpersist()
    return out
