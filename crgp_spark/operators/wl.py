"""1-dimensional Weisfeiler-Leman color refinement — the canonical
graph-structure fingerprint (Weisfeiler & Leman 1968; the expressive
ceiling of message-passing GNNs, Morris et al. 2019, Xu et al. 2019).

Each round re-colors every vertex with a hash of (its own color, the
SORTED multiset of neighbor colors); after k rounds two vertices share
a color only if their k-hop neighborhoods are structurally
indistinguishable.  Production uses in an LLM-scale data pipeline:
structural dedup of derived graphs, graph featurization for quality
models, candidate blocking before expensive isomorphism checks.

Determinism/cross-engine exactness: colors are `functions.md5_num60`
of a canonical signature string ``own_color | c1,c2,...`` with the
neighbor colors sorted numerically — Spark's ``sort_array`` over a
``collect_list`` equals DuckDB's ``STRING_AGG(... ORDER BY color)``
byte for byte, so the oracle reproduces every round exactly.

Scale notes: one shuffle per round (groupBy vid over the edge-carried
neighbor colors); the per-vertex signature is O(degree) — hub vertices
make long strings, the same skew class as any neighborhood aggregation
(salt/split upstream via `pack.py` if a hub dominates).  Initial color
= degree (one round ahead of the constant-color start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.functions import md5_num60
from crgp_spark.plans.superstep import state_hint

__all__ = ["wl_refine"]


def wl_refine(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 2,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """``(vid, color)`` after ``rounds`` of 1-WL refinement over the
    simple undirected graph underlying ``(src, dst)``."""
    cfg = cfg or EngineConfig()
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    und = (
        edges.select(
            F.least("src", "dst").cast("long").alias("u"),
            F.greatest("src", "dst").cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = (
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .repartition(cfg.shuffle_partitions, "a")
        .persist()
    )
    colors = (
        adj.groupBy(F.col("a").alias("vid"))
        .agg(F.count(F.lit(1)).cast("long").alias("color"))
        .localCheckpoint(eager=True)
    )
    n = colors.count()

    for _ in range(rounds):
        nbrs = (
            adj.join(
                state_hint(
                    colors.select(
                        F.col("vid").alias("b"), F.col("color").alias("bc")
                    ),
                    n,
                ),
                "b",
            )
            .groupBy(F.col("a").alias("vid"))
            .agg(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("bc")),
                        lambda x: x.cast("string"),
                    ),
                ).alias("nbrs")
            )
        )
        colors = (
            colors.join(state_hint(nbrs, n), "vid")
            .select(
                "vid",
                md5_num60(
                    F.concat(
                        F.col("color").cast("string"),
                        F.lit("|"),
                        F.col("nbrs"),
                    )
                ).alias("color"),
            )
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    return colors
