"""Gaps-and-islands: consecutive-activity streaks per key.

The canonical SQL idiom the engine's window family was still missing
(sessions split on TIME gaps, SCD2 on VALUE changes; islands split on
BROKEN SEQUENCES): collapse each user's distinct active days into
maximal runs of consecutive days using the rank-difference trick —
``day - dense_rank(day)`` is constant within a run — then aggregate
per island.  Zero joins, zero UDFs.

Plan shape at 100 TB: one exchange on the key serves the rank window,
the day-dedup AND the island rollup (dedup is folded into the rollup
as a grouped COUNT DISTINCT precisely so it needs no own exchange);
per-key work is O(active days).  The rank-difference trick is what
makes this scale — the naive self-join formulation (day = day + 1)
would pay a second shuffle and blow up on long histories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def activity_streaks(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per key and island: ``(key_col, start_day, end_day, n_days)``
    where days are integer epoch days (micros // 86_400_000_000) and
    an island is a maximal run of consecutive active days."""
    from crgp_spark.functions import ts_micros

    # integer `div`, not double `/` + cast: a midnight-minus-1µs value
    # could round up through the double quotient
    days = events.select(
        F.col(key_col), ts_micros(ts_col).alias("_us")
    ).select(key_col, F.expr("_us div 86400000000").alias("day"))
    # no up-front distinct: dense_rank gives duplicate days the same
    # rank, so the rank-difference stays constant within a run, and a
    # pre-distinct would cost its own (key, day) exchange — this way
    # the ONE key exchange of the window serves the island rollup too
    # (HashPartitioning(key) satisfies the (key, island) clustering)
    w = Window.partitionBy(key_col).orderBy("day")
    islands = days.withColumn(
        "island", F.col("day") - F.dense_rank().over(w)
    )
    return (
        islands.groupBy(key_col, "island")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.countDistinct("day").cast("long").alias("n_days"),
        )
        .drop("island")
    )


def longest_streaks(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per key: ``(key_col, best_n_days, best_start_day, n_islands)``
    — the longest island (earliest start wins ties, via min_by on a
    composite that prefers LONGER then EARLIER) and the island count."""
    from crgp_spark.functions import ord_key

    st = activity_streaks(events, key_col, ts_col)
    # prefer longer streaks, then earlier start: maximize n_days,
    # minimize start_day -> min_by on (-n_days, start_day); the
    # oracle's narrower pads induce the same order
    ordkey = ord_key(F.lit(1_000_000) - F.col("n_days"), "start_day")
    return st.groupBy(key_col).agg(
        F.max("n_days").alias("best_n_days"),
        F.min_by("start_day", ordkey).alias("best_start_day"),
        F.count(F.lit(1)).alias("n_islands"),
    )
