"""Bounded-round single-source shortest paths (integer weights).

The hop-count BFS family (`bfs.py`, `harmonic.py`) answers "how many
steps"; this operator answers "how cheap" — min total edge weight from
a source set, the distributed Bellman-Ford every graph engine ships
(GraphX/Pregel SSSP is exactly this shape).  Rounds are FIXED rather
than run to fix-point so the result is a well-defined function of the
input ("cheapest path using at most ``rounds`` edges") that a DuckDB
oracle can reproduce by unrolling — the same honesty contract as
`kcore`/`mis`/`featprop`.

The flagship use over this engine's data: influence latency.  With
``w = max(dst_turn - src_turn, 1)`` on the derived influence edges
(clamped because originator edges may point backward in turn order,
``leaf.rs:53-66``), the distance from the conversation's originator is
the minimum number of turns for influence to travel to each reached
participant.

Cross-engine exactness: weights and distances are BIGINT, every round
is one ``MIN`` aggregation — no floats anywhere.

Scale shape at 100 TB: per round ONE shuffle — the state table joins
the edge table on the source key (under the repo-wide ``state_hint``
policy: never Catalyst-broadcast per-iteration state on large graphs)
and the union re-aggregates with a map-side-combinable ``MIN``.
State volume is the reached set, never |V|²; ``localCheckpoint`` per
round keeps the plan tree flat (the repo-wide iterative-operator
rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint


def bounded_sssp(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 4,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """``edges`` = directed ``(src, dst, w)`` with BIGINT-safe integer
    weights; ``sources`` = one-column ``vid`` frame.  Returns ``(vid,
    dist)`` — the minimum total weight over paths of at most ``rounds``
    edges, for every vertex reached (sources themselves at 0)."""
    cfg = cfg or EngineConfig()
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("w").cast("long").alias("w"),
    ).repartition(cfg.shuffle_partitions, "src").persist()
    n_vert = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )

    dist = (
        sources.select(F.col("vid").cast("long").alias("vid"))
        .distinct()
        .select("vid", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        relaxed = (
            e.join(state_hint(dist, n_vert), e.src == dist.vid)
            .select(F.col("dst").alias("vid"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("vid")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return dist
