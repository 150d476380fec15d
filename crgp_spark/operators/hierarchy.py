"""Hierarchy analytics over a parent forest — depth, root, subtree
rollup — by pointer-doubled ancestor closure.

The reference's influence edges form a cascade DAG per conversation
(``reconstruct.rs:37-134`` emits every possible influencer); collapsing
each activation to its single LATEST strictly-earlier influencer is the
standard most-recent-influencer reconstruction of the cascade TREE, and
org charts / BOM tables / reply threads are the same shape. Spark has
no recursive CTE, so the closure is built by POINTER DOUBLING:

    P_k(v) = v's 2^k-th ancestor          (compose P_k with itself)
    A_k(v) = ancestors at distance 1..2^k (extend A_k through P_k)

⌈log2 depth⌉ rounds of co-partitioned hash joins — never a
per-level loop, so a depth-1000 chain costs 10 supersteps, not 1000.
From the closure, every hierarchy statistic is one aggregation:

    depth(v)     = MAX d                (root = ARG-MAX ancestor)
    subtree_n(v) = 1 + #{u : v ∈ anc(u)}  (descendants incl. self)

Scale shape: the closure is O(Σ depth(v)) rows — the honest output size
of any ancestor explosion (a BOM "explode" emits the same rows); both
per-round joins go through ``plans/superstep.state_hint`` and each
round's checkpoints are wrapped in ``reset_stats`` because the doubling
join combines state with state (the Catalyst stats-squaring trap,
CLAUDE.md). All counts are exact BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import (
    _release_stale_checkpoints,
    reset_stats,
    state_hint,
)


def parent_tree(edges: DataFrame) -> DataFrame:
    """Collapse a monotone influence DAG to its parent forest:
    ``(vid, parent)`` where parent = MAX src over edges with
    ``src < dst`` (the latest strictly-earlier influencer). The strict
    ``<`` filter makes the result acyclic BY CONSTRUCTION — every
    parent id is smaller than its child's — so downstream closure
    loops terminate on any input."""
    return (
        edges.filter(F.col("src") < F.col("dst"))
        .groupBy(F.col("dst").alias("vid"))
        .agg(F.max("src").alias("parent"))
    )


def ancestor_closure(
    spark: SparkSession,
    parents: DataFrame,
    cfg: EngineConfig | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """All-ancestor pairs ``(vid, anc, d)`` (d >= 1 hops) of a parent
    forest, in ⌈log2 depth⌉ pointer-doubling rounds."""
    n = parents.count() or 1
    # P: the 2^k-th-ancestor pointer (vid, ptr, jump); A: the closure
    ptr = parents.select(
        "vid", F.col("parent").alias("ptr"), F.lit(1).cast("long").alias("jump")
    ).localCheckpoint(eager=True)
    anc = parents.select(
        "vid", F.col("parent").alias("anc"), F.lit(1).cast("long").alias("d")
    ).localCheckpoint(eager=True)
    for it in range(max_rounds):
        if not ptr.take(1):
            break
        # extend the closure through the current jump pointer:
        # (v --jump--> m) + (m --d--> a)  =>  (v --jump+d--> a)
        hop = ptr.alias("p").join(
            state_hint(anc.alias("a"), n),
            F.col("p.ptr") == F.col("a.vid"),
        ).select(
            F.col("p.vid").alias("vid"),
            F.col("a.anc").alias("anc"),
            (F.col("p.jump") + F.col("a.d")).alias("d"),
        )
        anc = reset_stats(
            anc.unionByName(hop).localCheckpoint(eager=True)
        )
        # square the pointer: P_{k+1} = P_k ∘ P_k (vertices without a
        # 2^{k+1}-th ancestor drop out; loop ends when none remain)
        ptr = reset_stats(
            ptr.alias("p")
            .join(
                state_hint(ptr.alias("q"), n),
                F.col("p.ptr") == F.col("q.vid"),
            )
            .select(
                F.col("p.vid").alias("vid"),
                F.col("q.ptr").alias("ptr"),
                (F.col("p.jump") + F.col("q.jump")).alias("jump"),
            )
            .localCheckpoint(eager=True)
        )
        _release_stale_checkpoints(spark, it)
    else:
        raise RuntimeError(
            f"ancestor closure did not drain in {max_rounds} doubling "
            "rounds — is the parent table acyclic?"
        )
    return anc


def tree_stats(
    spark: SparkSession,
    parents: DataFrame,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Per-vertex hierarchy statistics ``(vid, depth, root,
    subtree_n)`` of a parent forest: depth = hops to the root (0 for
    roots), root = the forest root above ``vid`` (itself for roots),
    subtree_n = descendants including self. One ancestor closure, two
    aggregations."""
    verts = (
        parents.select("vid")
        .unionByName(parents.select(F.col("parent").alias("vid")))
        .distinct()
    )
    anc = ancestor_closure(spark, parents, cfg)
    up = anc.groupBy("vid").agg(
        F.max("d").alias("depth"), F.max_by("anc", "d").alias("root")
    )
    down = anc.groupBy(F.col("anc").alias("vid")).agg(
        F.count(F.lit(1)).alias("n_desc")
    )
    return (
        verts.join(up, "vid", "left")
        .join(down, "vid", "left")
        .select(
            "vid",
            F.coalesce("depth", F.lit(0)).cast("long").alias("depth"),
            F.coalesce("root", F.col("vid")).alias("root"),
            (F.coalesce("n_desc", F.lit(0)) + 1).cast("long").alias(
                "subtree_n"
            ),
        )
    )
