"""Temporal PageRank (Rozenshtein & Gionis, ECML-PKDD 2016) — the
time-respecting ranking the static family cannot express: mass flows
only along edge SEQUENCES whose timestamps increase (u influenced v
at t₁ can pass influence onward only through edges leaving v after
t₁).  On reconstructed cascade edges this is the right causality
notion — a static PageRank happily routes mass backwards in time.
Sits beside ``temporalreach.py`` (earliest-arrival reachability) as
the ranking member of the temporal family; the reference stops at
the influence edges themselves (``reconstruct.rs:37-134``).

Bounded exact variant (same spirit as ``harmonic``'s radius cap and
``katz``'s fixed iterations): attenuated time-respecting path counts
up to length ``max_len``, in scaled-BIGINT fixed point with β = 1/D
applied as ONE floor division per edge per level AFTER the exact
integer sum:

    W₁(e)   = S div D                                   (every edge)
    W_l(e)  = (Σ_{e'→e, t' < t} W_{l-1}(e')) div D      (temporal join)
    score(v)= Σ_l Σ_{e: dst(e)=v} W_l(e)                 (exact BIGINT)

where ``e' → e`` chains on ``dst(e') = src(e)``.  Zero-count edges
are simply absent (sparse levels), so Spark and the unrolled DuckDB
twin agree bit-for-bit; the L1 normalization is ONE IEEE division at
the end.

Scale shape: each level is one equi-join on the shared vertex with a
scan-side ``t' < t`` residual (a temporal wedge join — fan-out is the
temporal path count, conversation-local on cascade edges) followed by
a partial-agg ``groupBy`` on the edge key; ``localCheckpoint``
truncates lineage per level.  No windows, no per-row Python, no
driver-side data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig

__all__ = ["temporal_pagerank"]


def temporal_pagerank(
    spark: SparkSession,
    edges_ts: DataFrame,
    max_len: int = 3,
    damp_den: int = 2,
    scale: int = 1_000_000,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """``edges_ts`` = ``(src, dst, t)`` with ``t`` an integer (micros)
    edge timestamp.  Returns ``(vid, tpr_scaled, tpr)`` — the exact
    attenuated time-respecting path-count score and its L1-normalized
    double."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    if damp_den < 2:
        raise ValueError(f"damp_den must be >= 2, got {damp_den}")
    cfg = cfg or EngineConfig()
    e = (
        edges_ts.select("src", "dst", "t")
        .repartition(cfg.shuffle_partitions, "src")
        .persist()
    )
    w = e.withColumn(
        "w", F.lit(int(scale) // int(damp_den)).cast("long")
    ).localCheckpoint(eager=True)
    levels = [w]
    for _ in range(1, max_len):
        prev = levels[-1].select(
            F.col("dst").alias("_pv"), F.col("t").alias("_pt"), "w"
        )
        nxt = (
            e.join(prev, (F.col("src") == F.col("_pv"))
                   & (F.col("_pt") < F.col("t")))
            .groupBy("src", "dst", "t")
            .agg(
                F.expr(f"CAST(SUM(w) div {int(damp_den)} AS BIGINT)").alias(
                    "w"
                )
            )
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)

    scores = reduce(
        lambda a, b: a.unionByName(b),
        [lv.select("dst", "w") for lv in levels],
    )
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    agg = scores.groupBy(F.col("dst").alias("vid")).agg(
        F.sum("w").cast("long").alias("_s")
    )
    base = verts.join(agg, "vid", "left").select(
        "vid", F.coalesce("_s", F.lit(0)).cast("long").alias("tpr_scaled")
    )
    tot = base.agg(F.sum("tpr_scaled").alias("_t"))
    out = base.crossJoin(F.broadcast(tot)).select(
        "vid",
        "tpr_scaled",
        F.when(
            F.col("_t") > 0,
            F.col("tpr_scaled").cast("double") / F.col("_t").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("tpr"),
    )
    e.unpersist()
    return out
