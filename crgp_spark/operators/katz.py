"""Katz centrality (Katz 1953) over the influence graph — the
attenuated-path-count companion to PageRank and HITS: a turn is
central if many turns point at it, DISCOUNTED by how far away the
pointing mass is (α per hop), with every vertex given a baseline β so
disconnected regions still rank.  PageRank divides a vertex's mass
among its out-edges; Katz replicates it (no out-degree normalization),
which is the right semantics for "how much attention flows INTO this
turn" on cascade graphs where replying to more turns should not dilute
each influence edge.  β=0 recovers un-normalized eigenvector
centrality; the reference computes neither (its per-vertex outputs
stop at influence edges, ``reconstruct.rs:37-134``) — this sits beside
``hits.py`` in the ranking family layered on the derived edge table.

Exactness across engines (same device as HITS's integer
path-counting): the recurrence is evaluated in scaled BIGINT
fixed-point with α = 1/D applied as ONE integer division per vertex
per round, AFTER the exact integer sum:

    x_0(v) = S            (S = beta_scale, β ≡ 1 in units of S)
    x_k(v) = S + (Σ_{u→v} x_{k-1}(u)) div D

Every intermediate is a BIGINT in both Spark (``div``) and DuckDB
(``//``) — no float summation order, no rounding ambiguity (all values
are non-negative, so floor = truncate in both).  The conventional L1
normalization happens ONCE at the end: one exact integer total, one
IEEE division per row.  Overflow bound: x_k ≤ S·((din_max/D)^k·k); at
S=1e6, D=4, k=3 int64 holds any din_max ≤ ~80 000 — raise D or lower S
for denser graphs (documented, not silently wrong: the exact sums
would overflow loudly in DuckDB's HUGEINT comparison).

Scale shape: each round is ONE ``groupBy(dst)`` shuffle with map-side
partial sums over the static edge table; per-round state joins follow
the shared ``state_hint`` policy (broadcast < 1M vertices,
``shuffle_hash`` above — plans/superstep.py, CLAUDE.md), and each
round truncates lineage with ``localCheckpoint`` like every iterative
operator here.  No windows, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint

__all__ = ["katz"]


def katz(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    fixed_iterations: int = 3,
    damp_den: int = 4,
    beta_scale: int = 1_000_000,
) -> DataFrame:
    """Returns ``(vid, katz_scaled, katz)``: the exact BIGINT
    fixed-point score after ``fixed_iterations`` rounds of

        x ← β·S + (A^T x) div damp_den

    and its L1-normalized double (sums to 1).  ``damp_den`` is the
    attenuation denominator (α = 1/damp_den); it must exceed the
    spectral radius scale for the series to be meaningful — for
    fixed-iteration scoring any value > 1 yields a well-defined
    ranking.
    """
    if damp_den < 2:
        raise ValueError(f"damp_den must be >= 2, got {damp_den}")
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

    x = verts.withColumn("x", F.lit(beta_scale).cast("long"))
    for _ in range(fixed_iterations):
        xv = state_hint(x.select(F.col("vid").alias("src"), "x"), n)
        msg = (
            e.join(xv, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("x").alias("_s"))
        )
        x = (
            verts.join(state_hint(msg, n), "vid", "left")
            .select(
                "vid",
                F.expr(
                    f"CAST({beta_scale} + (COALESCE(_s, 0L) div {damp_den})"
                    " AS BIGINT)"
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )

    # single L1 normalization: exact integer total, one IEEE division
    # per row (1-row broadcast cross-join — one job, no driver collect)
    tot = x.agg(F.sum("x").alias("tx"))
    out = x.crossJoin(F.broadcast(tot)).select(
        "vid",
        F.col("x").alias("katz_scaled"),
        (F.col("x").cast("double") / F.col("tx").cast("double")).alias(
            "katz"
        ),
    )
    e.unpersist()
    return out
