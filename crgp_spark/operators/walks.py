"""Deterministic hash-walks: random-walk corpora without randomness.

Graph-embedding pipelines (DeepWalk/node2vec) train on walk corpora
sampled from the link graph; at 100 TB the walk generation itself is a
Spark job and the sampling must be reproducible across retries or the
training corpus is nondeterministic.  The standard trick is hash-based
pseudo-sampling: at step ``t`` from vertex ``v`` the walk moves to the
out-neighbor minimizing ``md5(v:dst:t)`` — uniform-ish over neighbors,
yet a pure function of the graph, so re-running any lost partition (or
the DuckDB oracle twin) reproduces the walk bit-for-bit.

Plan shape per step (mirrors the reference's epoch/probe loop,
``run.rs:118-129`` / ``sync.rs:27-41``, like every iterative operator
here): frontier ⋈ edges on the current vertex (shuffle on ``src``,
co-partitioned with the persisted edge table) → per-walk argmin over
the hash (``min_by``, a map-side-combinable aggregate — no window, no
sort) → ``localCheckpoint`` to truncate lineage.  The frontier is one
row per live walk, so a step's traffic is O(active walks + their
out-degrees) regardless of graph size; walks die at dangling vertices
by the inner join.  State-side join strategy follows the shared
``state_hint`` policy (broadcast < 1M rows, ``shuffle_hash`` above —
see plans/superstep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint


def hash_walks(
    spark: SparkSession,
    edges: DataFrame,
    steps: int = 4,
    cfg: EngineConfig | None = None,
    starts: DataFrame | None = None,
) -> DataFrame:
    """One deterministic walk of up to ``steps`` hops per start vertex.

    ``starts``: optional one-column ``vid`` DataFrame; defaults to every
    vertex with at least one out-edge.  Returns ``(walk_id, step, vid)``
    — ``walk_id`` is the start vertex, step 0 is the start itself; a
    walk emits no further rows once it reaches a vertex without
    out-edges (md5 collisions aside, the argmin is unique because the
    hash input ``cur:dst:step`` is unique per candidate).
    """
    cfg = cfg or EngineConfig()
    e = (
        edges.select("src", "dst")
        .distinct()
        .repartition(cfg.shuffle_partitions, "src")
        .persist()
    )
    if starts is None:
        starts = e.select(F.col("src").alias("vid")).distinct()
    frontier = (
        starts.select(F.col("vid").cast("long").alias("walk_id"))
        .distinct()
        .withColumn("cur", F.col("walk_id"))
        .localCheckpoint(eager=True)
    )
    n_walks = frontier.count()
    out = [
        frontier.select(
            "walk_id", F.lit(0).cast("int").alias("step"),
            F.col("cur").alias("vid"),
        )
    ]

    for t in range(1, steps + 1):
        h = F.md5(
            F.concat_ws(
                ":",
                F.col("cur").cast("string"),
                F.col("dst").cast("string"),
                F.lit(str(t)),
            )
        )
        frontier = (
            e.join(state_hint(frontier, n_walks), e.src == F.col("cur"))
            .select("walk_id", "dst", h.alias("h"))
            .groupBy("walk_id")
            .agg(F.min_by("dst", "h").alias("cur"))
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        out.append(
            frontier.select(
                "walk_id", F.lit(t).cast("int").alias("step"),
                F.col("cur").alias("vid"),
            )
        )

    e.unpersist()
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
