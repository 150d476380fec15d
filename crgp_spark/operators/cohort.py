"""Behavioral analytics over the events stream: cohort retention and
funnel conversion — the two canonical product-analytics shapes a user
of the warehouse runs next to the link-graph queries (SURVEY.md §2.2's
"query capabilities" parity, same rationale as operators/relational.py).

Cross-engine exactness: calendar bucketing is integer floor-division
of epoch micros by the day length (``DIV``/``//`` on BIGINT — no float
date math), users are counted with exact COUNT(DISTINCT), and funnel
stage ordering compares integer micros.  Nothing rounds, so the DuckDB
twins match bit-for-bit.

Scale shape: retention is two groupBys keyed on ``user_id`` then
``(cohort, offset)`` — both map-side-combinable partial aggregates
(COUNT(DISTINCT) compiles to the two-stage Expand plan); the funnel is
ONE groupBy(user_id) pivoting the per-stage min timestamps wide (a
conditional-MIN aggregate per stage, no self-joins at all), then a
1-row conditional count.  Both shuffle once on ``user_id`` no matter
how many stages or offsets — the right plan at any event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crgp_spark.functions import ts_micros

_DAY_US = 86_400_000_000


def cohort_retention(events: DataFrame) -> DataFrame:
    """Classic day-grain retention triangle: cohort = a user's first
    event day (epoch days), offset = days since cohort day.  Returns
    ``(cohort_day, offset_days, n_users)`` — distinct users from that
    cohort active at that offset (offset 0 row = cohort size)."""
    ev = events.select(
        "user_id", (ts_micros("ts") - (ts_micros("ts") % _DAY_US))
        .alias("_d0"),
    ).select("user_id", (F.col("_d0") / _DAY_US).cast("long").alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_days")
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def funnel_counts(
    events: DataFrame,
    stages: tuple[str, ...] = ("signup", "view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel conversion: a user clears stage ``i`` if their
    FIRST stage-``i`` event is at or after their first stage-``i−1``
    event (equal timestamps count — first-touch semantics), chaining
    from stage 0.  Returns one row ``(n_<stage> ...)`` with the user
    count clearing each stage."""
    us = ts_micros("ts")
    mins = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, us)).alias(f"t{i}")
            for i, s in enumerate(stages)
        ]
    )
    return funnel_from_mins(mins, stages)


def funnel_from_mins(
    mins: DataFrame, stages: tuple[str, ...]
) -> DataFrame:
    """Fold per-user first-touch timestamps ``t0..tN`` into the funnel
    row — shared by the batch scan above and the streamed min-vector
    state (`streaming/funnel.py`), which drains the SAME mins shape
    (per-stage MIN is a commutative monoid, so micro-batch slicing
    cannot change it)."""
    cleared = F.col("t0").isNotNull()
    flags = [cleared.cast("long").alias(f"n_{stages[0]}")]
    for i in range(1, len(stages)):
        cleared = (
            cleared
            & F.col(f"t{i}").isNotNull()
            & (F.col(f"t{i}") >= F.col(f"t{i - 1}"))
        )
        flags.append(cleared.cast("long").alias(f"n_{stages[i]}"))
    per_user = mins.select(*flags)
    return per_user.agg(
        *[F.sum(f"n_{s}").alias(f"n_{s}") for s in stages]
    )


def adoption_curve(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cumulative adoption: ``(day, new_users, cum_users)`` — users
    FIRST seen each epoch day and the running total.  Two partial-agg
    groupBys (per-user MIN day, then per-day count) plus a running-sum
    window over the DAY-GRAIN rows — one row per day, so the global
    window is metadata-sized no matter the event volume (same
    rationale as `compaction.compaction_plan`)."""
    from pyspark.sql import Window

    day = events.select(
        F.col(key_col).alias("k"), ts_micros(ts_col).alias("_us")
    ).selectExpr("k", f"_us div {_DAY_US} AS day")
    first = day.groupBy("k").agg(F.min("day").alias("day"))
    daily = first.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


def stage_latency(
    events: DataFrame,
    from_stage: str,
    to_stage: str,
) -> DataFrame:
    """Time-to-convert between two funnel stages: per user, the gap
    from their FIRST ``from_stage`` event to their FIRST ``to_stage``
    event at-or-after it (first-touch, the `funnel_counts` convention).
    Returns ONE row ``(n_from, n_converted, min_us, p50_us, p90_us,
    max_us)`` — the percentiles are exact type-1 order statistics
    (value at rank ⌈q·n⌉, integer-rank comparison ``rank·10 ≥ q·10·n``,
    no interpolation), so every output is an exact BIGINT and the row
    hash-matches any engine.

    Plan shape: one per-user min-vector aggregate (map-side
    combinable), then one partitioned sort over CONVERTED users only —
    the funnel's waist, typically a small fraction of the corpus."""
    us = ts_micros("ts")
    mins = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == from_stage, us)).alias("t0"),
        F.min(F.when(F.col("event_type") == to_stage, us)).alias("t1"),
    )
    conv = mins.where(
        F.col("t0").isNotNull()
        & F.col("t1").isNotNull()
        & (F.col("t1") >= F.col("t0"))
    ).select((F.col("t1") - F.col("t0")).alias("d"))
    from pyspark.sql import Window

    ranked = conv.withColumn(
        "rn", F.row_number().over(Window.orderBy("d"))
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    # the funnel entry count folds in as a broadcast 1-row aggregate —
    # no driver-side collect (the scalar-fold discipline)
    n_from = mins.where(F.col("t0").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_from")
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_converted"),
        F.min("d").cast("long").alias("min_us"),
        F.min(F.when(F.col("rn") * 2 >= F.col("n"), F.col("d"))).alias(
            "p50_us"
        ),
        F.min(F.when(F.col("rn") * 10 >= F.col("n") * 9, F.col("d"))).alias(
            "p90_us"
        ),
        F.max("d").cast("long").alias("max_us"),
    ).crossJoin(F.broadcast(n_from)).select(
        "n_from", "n_converted", "min_us", "p50_us", "p90_us", "max_us"
    )
