"""δ-temporal motif counting over a timestamped interaction stream.

Temporal motifs (Paranjape, Benson & Leskovec, WSDM 2017) are the
time-respecting generalization of static subgraph counts: an ordered
sequence of directed interactions whose timestamps all fall within a
window δ. On a transcripts/event log they answer the questions static
triangle counts (``operators/triangles.py``) cannot — "does B answer A
and then A answer back within the hour?" (ping-pong), "do replies chain
A→B→C?" (temporal 2-path), "do reply chains close back A→B→C→A?"
(cyclic temporal triangle). The reference computes only static cascade
structure (``reconstruct.rs:37-134``); this operator is the temporal
census its users run downstream of the same activation data.

Counted motifs (strict time order ``t1 < t2 (< t3)``, span ``≤ δ``):

- ping-pong   — (a→b, t1), (b→a, t2)
- 2-path      — (a→b, t1), (b→c, t2), c ≠ a
- triangle    — (a→b, t1), (b→c, t2), (c→a, t3)  (the cyclic M_{5,3})

Scale shape: the motif joins are EQUI-joins on the shared vertex
(``x.dst = y.src``) with the δ-window as a residual range predicate —
hash-partitioned by vertex, never a cross join. Fan-out per interaction
is bounded by the actor's activity inside one δ window, so intermediate
size is O(Σ_v d_in(v)·d_out^δ(v)); hub actors are the classic skew case
and go through AQE skew-join / ``operators/skewjoin.py`` salting when a
single vertex dominates. All counts are exact BIGINTs — no floats
anywhere, bit-identical to the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import ts_micros


def temporal_interactions(
    events: DataFrame,
    channel_col: str = "event_type",
    actor_col: str = "user_id",
) -> DataFrame:
    """Timestamped directed interactions ``(src, dst, us)`` from an event
    log: actor ``dst`` acted immediately after ``src`` on the same
    channel, stamped at the LATER event's microsecond timestamp (the
    succession moment). The per-event twin of
    ``transitions.succession_graph`` — same window, no aggregation."""
    w = Window.partitionBy(channel_col).orderBy("ts", "event_id")
    return (
        events.select(
            F.col(actor_col).alias("src"),
            F.lead(actor_col).over(w).alias("dst"),
            F.lead(ts_micros("ts")).over(w).alias("us"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    )


def temporal_motif_counts(inter: DataFrame, delta_us: int) -> DataFrame:
    """One-row exact census ``(delta_us, n_events, n_pingpong, n_2path,
    n_triangle)`` of the δ-temporal motifs above over ``(src, dst, us)``
    interactions. Ties in ``us`` are excluded by the strict ``<`` —
    deterministic under any engine's join order."""
    if delta_us <= 0:
        raise ValueError(f"delta_us must be > 0, got {delta_us}")
    e = inter.select("src", "dst", "us")
    x = e.alias("x")
    y = e.alias("y")
    z = e.alias("z")
    pairs = x.join(
        y,
        (F.col("x.dst") == F.col("y.src"))
        & (F.col("y.us") > F.col("x.us"))
        & (F.col("y.us") <= F.col("x.us") + F.lit(delta_us)),
    )
    # ping-pong + open 2-paths in ONE pass over the pair join
    duo = pairs.agg(
        F.count(F.when(F.col("y.dst") == F.col("x.src"), 1)).alias(
            "n_pingpong"
        ),
        F.count(F.when(F.col("y.dst") != F.col("x.src"), 1)).alias(
            "n_2path"
        ),
    )
    tri = (
        pairs.filter(F.col("y.dst") != F.col("x.src"))
        .join(
            z,
            (F.col("z.src") == F.col("y.dst"))
            & (F.col("z.dst") == F.col("x.src"))
            & (F.col("z.us") > F.col("y.us"))
            & (F.col("z.us") <= F.col("x.us") + F.lit(delta_us)),
        )
        .agg(F.count(F.lit(1)).alias("n_triangle"))
    )
    n = e.agg(F.count(F.lit(1)).alias("n_events"))
    # three 1-row aggregates folded broadcast-side (the engine's scalar
    # cross-join shape — no collect)
    return (
        n.crossJoin(F.broadcast(duo))
        .crossJoin(F.broadcast(tri))
        .select(
            F.lit(delta_us).cast("long").alias("delta_us"),
            "n_events",
            "n_pingpong",
            "n_2path",
            "n_triangle",
        )
    )
