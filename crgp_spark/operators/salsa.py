"""SALSA (Stochastic Approach for Link-Structure Analysis, Lempel &
Moran, WWW 2000) over the influence graph — the degree-normalized
sibling of HITS, and the link-analysis ranking used at industrial
scale for who-to-follow recommendation (Twitter's GraphJet /
WTF-SALSA, Gupta et al. WWW 2013 — public literature).  Where HITS
lets high-degree hubs dominate (scores are raw path counts), SALSA
walks a STOCHASTIC process: a hub splits its mass evenly across its
out-edges, an authority splits evenly across its in-edges — so scores
measure reachable-mass share, not degree-inflated path volume.  The
reference stops at influence edges (``reconstruct.rs:37-134``); this
sits beside ``hits.py`` / ``katz.py`` / ``pagerank.py`` in the ranking
family layered on the derived edge table.

Exactness across engines (same device as PageRank's integer-cents and
Katz's fixed-point): mass is a scaled BIGINT, each stochastic split is
ONE floor division per vertex per half-round applied BEFORE the edge
fan-out:

    a_k(v) = Σ_{u→v}  h_{k-1}(u) div dout(u)
    h_k(u) = Σ_{u→v}  a_k(v)     div din(v)

Every intermediate is a BIGINT in both Spark (``div``) and DuckDB
(``//``); values are non-negative so floor = truncate in both.  The
process is sub-stochastic (each split loses < dout remainder units),
so values stay ≤ S·|V| — no overflow at any realistic scale.  The
conventional L1 normalization happens ONCE at the end: two exact
integer totals, one IEEE division per column.

Scale shape: degrees are computed once (two map-side-combinable
aggregates) and joined onto the static edge table up front; each
half-iteration is then ONE shuffle (``groupBy(dst)`` /
``groupBy(src)``) with map-side partial sums.  Per-round state joins
follow the shared ``state_hint`` policy (broadcast < 1M vertices,
``shuffle_hash`` above — plans/superstep.py, CLAUDE.md), and the loop
truncates lineage with ``localCheckpoint`` per superstep like every
iterative operator here.  No windows, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint

__all__ = ["salsa"]


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    fixed_iterations: int = 2,
    mass_scale: int = 1_000_000,
) -> DataFrame:
    """Returns ``(vid, hub_scaled, auth_scaled, hub, auth)`` after
    ``fixed_iterations`` exact integer stochastic rounds from the
    all-``mass_scale`` hub initialization; ``hub``/``auth`` are the
    L1-normalized doubles (one IEEE division each)."""
    if fixed_iterations < 1:
        raise ValueError(
            f"fixed_iterations must be >= 1, got {fixed_iterations}"
        )
    cfg = cfg or EngineConfig()
    e0 = edges.select("src", "dst")
    dout = e0.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    din = e0.groupBy("dst").agg(F.count(F.lit(1)).alias("id"))
    e = (
        e0.join(dout, "src")
        .join(din, "dst")
        .select("src", "dst", "od", "id")
        .repartition(cfg.shuffle_partitions, "src")
        .persist()
    )
    verts = (
        e0.select(F.col("src").alias("vid"))
        .unionByName(e0.select(F.col("dst").alias("vid")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()

    h = verts.withColumn("h", F.lit(mass_scale).cast("long"))
    a = verts.withColumn("a", F.lit(0).cast("long"))
    for _ in range(fixed_iterations):
        # authorities from hubs: a(v) = Σ_{u→v} h(u) div dout(u)
        hv = state_hint(h.select(F.col("vid").alias("src"), "h"), n)
        a_msg = (
            e.join(hv, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum(F.expr("h div od")).alias("_a"))
        )
        a = (
            verts.join(state_hint(a_msg, n), "vid", "left")
            .select("vid", F.coalesce("_a", F.lit(0)).cast("long").alias("a"))
            .localCheckpoint(eager=True)
        )
        # hubs from authorities: h(u) = Σ_{u→v} a(v) div din(v)
        av = state_hint(a.select(F.col("vid").alias("dst"), "a"), n)
        h_msg = (
            e.join(av, "dst")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.sum(F.expr("a div id")).alias("_h"))
        )
        h = (
            verts.join(state_hint(h_msg, n), "vid", "left")
            .select("vid", F.coalesce("_h", F.lit(0)).cast("long").alias("h"))
            .localCheckpoint(eager=True)
        )

    ha = h.join(a, "vid")
    totals = ha.agg(F.sum("h").alias("th"), F.sum("a").alias("ta"))
    out = ha.crossJoin(F.broadcast(totals)).select(
        "vid",
        F.col("h").alias("hub_scaled"),
        F.col("a").alias("auth_scaled"),
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
