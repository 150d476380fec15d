"""Time-respecting (temporal) earliest-arrival reachability.

Cascades are temporal graphs: an influence edge is traversable only
when it happens AFTER you arrived at its source — the defining
constraint of the reference's activation join (``reconstruct.rs:37-134``
derives an edge only when the influencer's activation strictly precedes
the retweet). ``earliest_arrival`` answers the operational question the
static reachability family (BFS / components / SCC) cannot: *whom could
these seed actors actually have influenced, and how early* — following
succession edges whose timestamps never decrease along the path
(Holme & Saramäki 2012, temporal networks; Wu et al. 2014 VLDB,
minimum-arrival paths).

Semantics: ``arrival(seed) = 0``; edge ``(u, v, t)`` is traversable
when ``t >= arrival(u)`` and yields ``arrival(v) <= t``; the result is
the minimum over all time-respecting paths. Earlier arrival DOMINATES:
everything reachable from ``(v, t)`` is reachable from ``(v, t' < t)``,
so keeping only ``min(arrival)`` per vertex — a |V|-row state, not a
path set — loses nothing.

Superstep (all DataFrame ops, no per-row Python):

1. messages: ``edges ⋈ state`` on ``src`` filtered to ``t >= arrival``,
   then one map-side-combinable ``groupBy(dst).min(t)``;
2. merge: UNION + ``groupBy(vid).min(arrival)`` — one combinable
   shuffle, no outer join (broadcasting either side of a full-outer
   join is illegal anyway, so the union shape is both simpler and the
   scale-correct plan);
3. convergence: ONE aggregate action per superstep on the
   ``(count, sum)`` pair — the vertex set only grows and arrivals only
   decrease, so the pair is stationary exactly at the fixpoint.

State joins go through ``plans/superstep.state_hint`` (CLAUDE.md
policy); per-superstep plans are truncated with
``localCheckpoint(eager=True)``. Stats growth is linear (state joins
only the fixed edge table — no state ⋈ state, so no ``reset_stats``
needed; see `plans/superstep.reset_stats`). Superstep count is bounded
by the longest time-respecting path (hop-monotone), with a loud raise
on budget exhaustion (``scc.py`` precedent).

Unlike plain reachability, pointer jumping does NOT apply: temporal
reachability is not transitive ("u reaches v by time t1" and "v reaches
w by t0 < t1" do not compose), which is exactly why this is its own
operator and not a components variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.functions import ts_micros
from crgp_spark.plans.superstep import _release_stale_checkpoints, state_hint


def temporal_edges(
    events: DataFrame,
    channel_col: str = "event_type",
    actor_col: str = "user_id",
) -> DataFrame:
    """Timestamped actor-succession edges ``(src, dst, t)``: ``dst``
    acted immediately after ``src`` on the same channel, ``t`` = the
    dst event's timestamp in epoch micros (the temporal twin of
    ``transitions.py::succession_graph`` — every occurrence kept with
    its time instead of weight-thresholded counts). One window shuffled
    on the bounded-cardinality channel column."""
    w = Window.partitionBy(channel_col).orderBy("ts", "event_id")
    return (
        events.select(
            F.col(actor_col).alias("src"),
            F.lead(actor_col).over(w).alias("dst"),
            F.lead(ts_micros("ts")).over(w).alias("t"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )


def earliest_arrival(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    cfg: EngineConfig | None = None,
    max_supersteps: int = 64,
) -> DataFrame:
    """Minimum time-respecting arrival from ``seeds`` over temporal
    edges ``(src, dst, t)``; returns ``(vid, arrival_us)``. ``seeds``
    is ``(vid)`` — arrival 0, i.e. "before the log" — or
    ``(vid, arrival)`` for release-time semantics (e.g. a seed can
    influence only after its own first action). Unreached vertices are
    absent (the frontier never saw them); a seed's own arrival can
    improve if another seed reaches it earlier."""
    cfg = cfg or EngineConfig()
    if "arrival" not in seeds.columns:
        seeds = seeds.select("vid", F.lit(0).alias("arrival"))
    e = (
        edges.select("src", "dst", F.col("t").cast("long").alias("t"))
        .repartition(cfg.shuffle_partitions, "src")
        .localCheckpoint(eager=True)
    )
    # upper bound for the state-hint sizing: every vertex of the graph
    # plus every seed (metadata-sized one-time count)
    n_bound = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .unionByName(seeds.select(F.col("vid")))
        .distinct()
        .count()
    )
    state = (
        seeds.select("vid", F.col("arrival").cast("long").alias("arrival"))
        .groupBy("vid")
        .agg(F.min("arrival").alias("arrival"))
        .localCheckpoint(eager=True)
    )
    prev = tuple(
        state.agg(
            F.count(F.lit(1)).alias("n"), F.sum("arrival").alias("s")
        ).first()
    )
    for step in range(1, max_supersteps + 1):
        msgs = (
            e.join(
                state_hint(
                    state.select(
                        F.col("vid").alias("src"), F.col("arrival")
                    ),
                    n_bound,
                ),
                "src",
            )
            .filter(F.col("t") >= F.col("arrival"))
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min("t").alias("arrival"))
        )
        state = (
            state.unionByName(msgs)
            .groupBy("vid")
            .agg(F.min("arrival").alias("arrival"))
            .localCheckpoint(eager=True)
        )
        cur = tuple(
            state.agg(
                F.count(F.lit(1)).alias("n"), F.sum("arrival").alias("s")
            ).first()
        )
        _release_stale_checkpoints(spark, step, every=4)
        if cur == prev:
            return state.select("vid", F.col("arrival").alias("arrival_us"))
        prev = cur
    raise RuntimeError(
        f"earliest_arrival: no fixpoint in {max_supersteps} supersteps; "
        "raise max_supersteps"
    )
