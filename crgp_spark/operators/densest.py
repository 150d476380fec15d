"""Densest-subgraph approximation by parallel peeling.

"Where is the dense core of this link graph" — spam/link-farm rings,
tightly-knit conversation clusters, the community seed for k-core's
shell structure. The exact densest subgraph needs max-flow; the
scale-out standard is Bahmani-Kumar-Vassilvitskii (VLDB'12): each
round, peel EVERY vertex whose degree is at most ``2(1+ε)·E/V`` at
once; among the graphs seen across rounds, the densest is within
``2(1+ε)`` of optimal, and the vertex count provably shrinks by a
``1/(1+ε)`` factor per round — O(log V) rounds total, each one
degree-aggregate + two anti-joins, the canonical MapReduce shape.

ε here is 1 (threshold ``deg ≤ 4E/V``): V strictly halves per round,
so ``rounds = 16`` drains any graph up to 65 k vertices and the
approximation factor is 4 — the coarse-but-few-rounds end of the BKV
tradeoff, chosen so the DuckDB oracle can unroll the loop (the MIS
CTE-budget precedent); production callers lower ``eps_num/eps_den``
and raise ``rounds`` for tighter bounds.

Everything stays integer-exact: the peel predicate cross-multiplies
(``deg·den·V ≤ 2·(den+num)·E``), the per-round curve reports exact
``(n_verts, n_edges)``, and best-round selection compares the ONE
IEEE division ``E/V`` (identical operands both engines — the
grouped_trend float contract). No per-row Python, no data-path
collect: per round the driver holds two scalars (the metadata-action
budget of every iterative operator here; reference epoch loop
``run.rs:118-129``).

Degree is computed on the DEDUPLICATED undirected edge set (u < v
canonical form), so multi-edges and direction never skew density;
isolated vertices cannot exist (the graph is its edge list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint


def _und(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _peel_rounds(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int,
    eps_num: int,
    eps_den: int,
    cfg: EngineConfig,
) -> list[tuple[int, int, int, DataFrame]]:
    """Run the peel; returns per-round ``(rnd, n_verts, n_edges,
    graph_before_peel)`` — the checkpointed graphs are retained so the
    best round's vertex set can be re-derived lazily (rounds is small
    by construction)."""
    g = (
        _und(edges)
        .repartition(cfg.shuffle_partitions, "u")
        .localCheckpoint(eager=True)
    )
    out: list[tuple[int, int, int, DataFrame]] = []
    thr = 2 * (eps_den + eps_num)  # peel iff deg·eps_den·V <= thr·E
    for r in range(1, rounds + 1):
        deg = (
            g.select(F.col("u").alias("x"))
            .unionByName(g.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("dg"))
        )
        nv, ne = (
            deg.agg(
                F.count(F.lit(1)).alias("nv"),
                (F.coalesce(F.sum("dg"), F.lit(0)) / 2)
                .cast("long")
                .alias("ne"),
            ).first()
        )
        out.append((r, int(nv), int(ne), g))
        if nv == 0:
            out.extend((rr, 0, 0, g) for rr in range(r + 1, rounds + 1))
            break
        peel = state_hint(
            deg.filter(
                F.col("dg") * eps_den * F.lit(int(nv))
                <= F.lit(thr) * F.lit(int(ne))
            ).select("x"),
            nv,
        )
        g = (
            g.join(peel, g.u == peel.x, "left_anti")
            .join(peel, g.v == peel.x, "left_anti")
            .localCheckpoint(eager=True)
        )
    return out


def densest_curve(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 16,
    eps_num: int = 1,
    eps_den: int = 1,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Per-round peel curve ``(rnd, n_verts, n_edges)`` — exact
    integers; rounds after the graph drains report zeros so the shape
    is input-independent. ``max(n_edges/n_verts)`` over the curve is
    the ``2(1+ε)``-approximate maximum density."""
    cfg = cfg or EngineConfig()
    rs = _peel_rounds(spark, edges, rounds, eps_num, eps_den, cfg)
    return spark.createDataFrame(
        [(r, nv, ne) for r, nv, ne, _ in rs],
        "rnd int, n_verts long, n_edges long",
    )


def densest_vertices(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 16,
    eps_num: int = 1,
    eps_den: int = 1,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Vertex set ``(vid)`` of the densest graph seen across rounds
    (ties: earliest round). Density compares as the IEEE double
    ``n_edges / n_verts`` — deliberately, so the DuckDB twin's ORDER
    BY reproduces the selection bit-for-bit."""
    cfg = cfg or EngineConfig()
    rs = _peel_rounds(spark, edges, rounds, eps_num, eps_den, cfg)
    live = [(ne / nv, -r, g) for r, nv, ne, g in rs if nv > 0]
    if not live:
        return edges.select(F.col("src").alias("vid")).filter(F.lit(False))
    _, _, g = max(live, key=lambda t: (t[0], t[1]))
    return (
        g.select(F.col("u").alias("vid"))
        .unionByName(g.select(F.col("v").alias("vid")))
        .distinct()
    )
