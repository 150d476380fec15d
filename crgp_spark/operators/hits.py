"""HITS (hubs & authorities, Kleinberg 1999) over the influence graph.

Who *drives* conversations (hubs: turns whose influence reaches many
influential targets) vs who *absorbs* them (authorities)? — the natural
companion ranking to PageRank on the reconstructed cascade edges.

Exactness across engines: for a FIXED iteration count with all-ones
initialization, the unnormalized HITS recurrences

    a_k(v) = Σ_{u→v} h_{k-1}(u)        h_k(u) = Σ_{u→v} a_k(v)

are pure integer path-counting — every intermediate is a BIGINT, so
Spark and an unrolled-SQL oracle agree bit-for-bit with no
float-summation-order ambiguity (the pitfall of normalizing each
round).  The conventional L1 normalization is applied ONCE at the end:
two exact integer sums, one IEEE division each, rounded with the
boundary-safe ``decimal_round`` idiom.  Overflow bound: scores after k
rounds are ≤ (max degree)^{2k}·|V|; int64 holds any realistic graph at
k ≤ 3 (the driver uses 2).

Scale shape: each half-iteration is one shuffle — ``groupBy(dst)`` then
``groupBy(src)`` — with map-side partial sums; the per-iteration state
joins follow the shared ``state_hint`` policy (broadcast < 1M vertices,
``shuffle_hash`` above — see plans/superstep.py and CLAUDE.md), and the
loop truncates lineage per superstep with ``localCheckpoint`` like
every iterative operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint


def hits(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    fixed_iterations: int = 2,
) -> DataFrame:
    """Returns ``(vid, hub, auth)`` with L1-normalized double scores
    (each column sums to 1 unless identically zero) after
    ``fixed_iterations`` exact integer rounds."""
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

    h = verts.withColumn("h", F.lit(1).cast("long"))
    a = verts.withColumn("a", F.lit(0).cast("long"))
    for _ in range(fixed_iterations):
        # authorities from hubs: a(v) = Σ_{u→v} h(u)
        hv = state_hint(h.select(F.col("vid").alias("src"), "h"), n)
        a_msg = (
            e.join(hv, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("h").alias("_a"))
        )
        a = (
            verts.join(state_hint(a_msg, n), "vid", "left")
            .select("vid", F.coalesce("_a", F.lit(0)).cast("long").alias("a"))
            .localCheckpoint(eager=True)
        )
        # hubs from authorities: h(u) = Σ_{u→v} a(v)
        av = state_hint(a.select(F.col("vid").alias("dst"), "a"), n)
        h_msg = (
            e.join(av, "dst")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.sum("a").alias("_h"))
        )
        h = (
            verts.join(state_hint(h_msg, n), "vid", "left")
            .select("vid", F.coalesce("_h", F.lit(0)).cast("long").alias("h"))
            .localCheckpoint(eager=True)
        )

    # single L1 normalization at the end: exact integer totals, one IEEE
    # division per column — deterministic across engines (1-row
    # broadcast cross-join keeps it one job, no driver collect)
    ha = h.join(a, "vid")
    totals = ha.agg(F.sum("h").alias("th"), F.sum("a").alias("ta"))
    out = ha.crossJoin(F.broadcast(totals)).select(
        "vid",
        F.when(
            F.col("th") > 0,
            F.col("h").cast("double") / F.col("th").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("hub"),
        F.when(
            F.col("ta") > 0,
            F.col("a").cast("double") / F.col("ta").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("auth"),
    )
    e.unpersist()
    return out
