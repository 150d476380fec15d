"""Quantized neighborhood feature propagation (GNN pre-aggregation).

GraphSAGE/LightGCN-style pipelines precompute k-hop neighbor
aggregates of per-vertex features as a batch Spark job before any
training sees the graph.  This operator iterates ``mean over
in-neighbors`` with the seed feature = out-degree (a purely structural
feature always available), re-quantizing to integer ``scale``-units
between hops.  The quantization is not just a trick: fixed-point
inter-layer features are standard in production GNN feature stores,
and here it makes every hop exact cross-engine — each mean is ONE
division of a BIGINT unit-sum by a BIGINT count (both ≤ 2^53 at any
realistic degree, so the IEEE result is identical in Spark and
DuckDB), immediately floored back to integer units; no float summation
order ever matters.

Plan shape per hop: one ``groupBy(dst)`` aggregate over the edge table
joined to the (vid → units) feature map — the same two-exchange
message-passing shape as a PageRank superstep, map-side partial sums
included.  ``hops`` is small and fixed, so the whole thing is one
linear DataFrame plan; no loop state, no checkpoint needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint


def neighborhood_mean(
    spark: SparkSession,
    edges: DataFrame,
    hops: int = 2,
    scale: int = 1_000_000,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Returns ``(vid, f0, f1, ..., f{hops})`` where ``f0`` is the
    vertex's out-degree and ``f{k+1}(v)`` is the mean of ``f{k}`` over
    v's in-neighbors (one incoming EDGE = one vote, so parallel edges
    weight their source accordingly); vertices with no in-edges get 0.
    All columns are DOUBLE = integer units / ``scale``."""
    cfg = cfg or EngineConfig()
    e = edges.select("src", "dst").repartition(cfg.shuffle_partitions, "src")
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    feats = verts.join(od, verts.vid == od.src, "left").select(
        "vid",
        (F.coalesce(F.col("deg"), F.lit(0)) * F.lit(scale))
        .cast("long")
        .alias("u0"),
    )
    # the feature map is |V|-row state joined once per hop — same
    # broadcast-vs-shuffle_hash policy as the iterative operators
    n_verts = feats.count()
    for k in range(1, hops + 1):
        agg = (
            e.join(state_hint(feats, n_verts), e.src == feats.vid)
            .groupBy("dst")
            .agg(
                F.floor(
                    F.sum(f"u{k - 1}").cast("double") / F.count(F.lit(1))
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("_u")
            )
        )
        feats = feats.join(agg, feats.vid == agg.dst, "left").select(
            "vid",
            *[f"u{j}" for j in range(k)],
            F.coalesce(F.col("_u"), F.lit(0)).alias(f"u{k}"),
        )
    return feats.select(
        "vid",
        *[
            (F.col(f"u{k}").cast("double") / F.lit(float(scale))).alias(f"f{k}")
            for k in range(hops + 1)
        ],
    )


def neighbor_sample(
    edges: DataFrame, fanout: int = 5
) -> DataFrame:
    """Deterministic GraphSAGE-style neighbor sampling: keep at most
    ``fanout`` out-neighbors per vertex — the ones with the smallest
    ``md5(src:dst)``, so the subsample is uniform-ish yet a pure
    function of the edge set (retries and the oracle reproduce it
    exactly; same idiom as operators/walks.py).

    Returns ``(src, dst, rk)`` with ``rk`` the 1-based hash rank.  The
    per-vertex top-``fanout`` compiles to a rank-limit window
    (WindowGroupLimit pushes the cut below the sort), partitioned by
    ``src`` — no global sort, one shuffle.  At 100 TB this is the
    standard fanout cut that bounds downstream neighborhood-aggregation
    cost per vertex regardless of hub degree."""
    h = F.md5(
        F.concat_ws(
            ":", F.col("src").cast("string"), F.col("dst").cast("string")
        )
    )
    w = Window.partitionBy("src").orderBy(h)
    return (
        edges.select("src", "dst")
        .distinct()
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= fanout)
    )
