"""Eigenvector centrality (Bonacich 1972) over the influence graph —
the power-iteration classic completing the ranking family
(``pagerank.py`` divides mass by out-degree, ``katz.py`` attenuates
with a baseline, ``hits.py`` couples two scores, ``salsa.py`` walks
stochastically; eigenvector centrality is the un-normalized fixpoint
x ∝ A^T x itself).  A turn is central if it is pointed at by central
turns, with no damping and no degree division — the right notion for
"prestige concentration" on cascade graphs.  The reference stops at
influence edges (``reconstruct.rs:37-134``).

Exactness across engines: plain power iteration needs a per-round
normalization (else values explode), and float normalization is
engine-ambiguous — so each round rescales in EXACT integer
arithmetic to a fixed ceiling S:

    r_k(v) = Σ_{u→v} x_{k-1}(u)           (BIGINT sums)
    m_k    = max_v r_k(v)                  (exact integer max)
    x_k(v) = (r_k(v) · S) div m_k          (floor division)

Every intermediate is a BIGINT in both Spark (``div``) and DuckDB
(``//``); the scalar ``m_k`` flows through a broadcast 1-row
cross-join (one job, no driver collect) in Spark and a scalar
subquery in the oracle.  The conventional L1 normalization happens
ONCE at the end.  Overflow bound: r_k ≤ din_max·S, and the rescale
multiplies by S before dividing — int64 holds any din_max ≤ ~9·10⁶
at S = 10⁶ (documented, and the exact sums would overflow loudly in
DuckDB's HUGEINT comparison, not silently).

Vertices in sinks-only components decay to 0 exactly as the math
says (eigenvector centrality is supported on the strongly-connected
core's in-closure); use ``katz`` when a baseline for peripheral
vertices is wanted.

Scale shape: identical to ``katz`` — one ``groupBy(dst)`` shuffle
with map-side partial sums per round over the static edge table,
state joins under the shared ``state_hint`` policy, ``localCheckpoint``
lineage truncation per round, plus one extra 1-row max-aggregate job
per round for the rescale scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint

__all__ = ["eigenvector_centrality"]


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    fixed_iterations: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Returns ``(vid, eig_scaled, eig)`` after ``fixed_iterations``
    exact integer power-iteration rounds with per-round max-rescale to
    ``scale``; ``eig`` is the L1-normalized double (one IEEE division
    per row)."""
    if fixed_iterations < 1:
        raise ValueError(
            f"fixed_iterations must be >= 1, got {fixed_iterations}"
        )
    cfg = cfg or EngineConfig()
    e = (
        edges.select("src", "dst")
        .repartition(cfg.shuffle_partitions, "src")
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()

    x = verts.withColumn("x", F.lit(scale).cast("long"))
    for _ in range(fixed_iterations):
        xv = state_hint(x.select(F.col("vid").alias("src"), "x"), n)
        msg = (
            e.join(xv, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("x").alias("_r"))
        )
        r = verts.join(state_hint(msg, n), "vid", "left").select(
            "vid", F.coalesce("_r", F.lit(0)).cast("long").alias("_r")
        )
        mx = r.agg(F.max("_r").alias("_m"))
        x = (
            r.crossJoin(F.broadcast(mx))
            .select(
                "vid",
                F.when(
                    F.col("_m") > 0,
                    F.expr(f"(_r * CAST({scale} AS BIGINT)) div _m"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("x"),
            )
            .localCheckpoint(eager=True)
        )

    tot = x.agg(F.sum("x").alias("tx"))
    out = x.crossJoin(F.broadcast(tot)).select(
        "vid",
        F.col("x").alias("eig_scaled"),
        F.when(
            F.col("tx") > 0,
            F.col("x").cast("double") / F.col("tx").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("eig"),
    )
    e.unpersist()
    return out
