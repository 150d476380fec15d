"""Deterministic Independent-Cascade simulation (Kempe, Kleinberg &
Tardos, KDD 2003) over the influence graph — the classic what-if
diffusion model on exactly the edge semantics this engine derives:
"if these k top influencers started a campaign, who gets activated,
and when?".  The reference reconstructs who DID influence whom
(``reconstruct.rs:37-134``); this simulates who WOULD, the natural
forward-model companion (influence-maximization literature runs on
retweet-cascade graphs precisely like these).

Determinism device (the engine's portable-hash idiom, see
``operators/sample.py``): in the IC model every edge's activation coin
is flipped AT MOST ONCE, so the process is equivalent to (a) keeping
each edge independently with probability p (the pre-flipped
"live-edge" graph of the KKT proof), then (b) BFS from the seed set —
activation round = live-edge BFS distance.  The coin is the md5-u32 of
``seed:src|dst`` taken mod ``p_den``: bit-identical in Spark and any
SQL dialect with ``MD5``, so the whole simulation is exactly
reproducible cross-engine (no RNG state, no iteration-order
dependence).

Scale shape: the live-edge filter is scan-side (md5 + mod inside
whole-stage codegen, no shuffle); seeds are one partial-agg degree
count + ``TakeOrderedAndProject`` (k rows); each round is ONE
``groupBy``-free hash join frontier expansion + distinct + anti-join
against the accumulated activation set, with ``localCheckpoint``
lineage truncation per round like every iterative operator here.
Frontier state is the output size, spread across the cluster.  No
per-row Python, no windows, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.operators.sample import _md5_u32

__all__ = ["independent_cascade", "live_edges"]


def live_edges(
    edges: DataFrame, p_num: int, p_den: int, seed: str = "ic"
) -> DataFrame:
    """The pre-flipped live-edge subgraph: keep (src, dst) iff
    ``md5_u32(seed:src|dst) mod p_den < p_num`` — each edge's one IC
    coin, flipped deterministically."""
    if not (0 <= p_num <= p_den) or p_den <= 0:
        raise ValueError(f"need 0 <= p_num <= p_den, got {p_num}/{p_den}")
    h = _md5_u32(
        F.concat(
            F.lit(seed + ":"),
            F.col("src").cast("string"),
            F.lit("|"),
            F.col("dst").cast("string"),
        )
    )
    return edges.select("src", "dst").filter((h % p_den) < p_num)


def independent_cascade(
    spark: SparkSession,
    edges: DataFrame,
    p_num: int = 3,
    p_den: int = 10,
    n_seeds: int = 20,
    rounds: int = 4,
    seed: str = "ic",
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Simulate IC diffusion from the ``n_seeds`` highest-out-degree
    vertices (deterministic tie-break by vid) for ``rounds`` rounds at
    edge probability ``p_num/p_den``.  Returns ``(vid, round)`` — every
    activated vertex with its earliest activation round (seeds are
    round 0)."""
    cfg = cfg or EngineConfig()
    live = (
        live_edges(edges, p_num, p_den, seed)
        .repartition(cfg.shuffle_partitions, "src")
        .persist()
    )
    seeds = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("src").asc())
        .limit(n_seeds)
        .select(F.col("src").alias("vid"))
    )
    activated = seeds.withColumn(
        "round", F.lit(0).cast("int")
    ).localCheckpoint(eager=True)
    frontier = activated.select("vid")
    for r in range(1, rounds + 1):
        nxt = (
            live.join(frontier, live.src == frontier.vid)
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(activated.select("vid"), "vid", "left_anti")
            .withColumn("round", F.lit(r).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        activated = activated.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("vid")
    live.unpersist()
    return activated
