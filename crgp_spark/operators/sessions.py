"""Event sessionization — gap-based session assignment over a keyed
event stream, the canonical window-function workload (SURVEY.md §2.2
"Window functions"; the reference has none — ordering there is an input
contract, ``twitter/get.rs:142-147`` — our engine makes it explicit).

Pure window expressions (lag → gap flag → running sum), whole-stage
codegen'd; one shuffle on the session key. At 100 TB the partition key
(``user_id``) bounds per-task state to one user's events — skewed power
users are exactly the AQE skew case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round, ts_micros


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    key: str = "user_id",
    order: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """Assign 1-based ``session_id`` per ``key``: a new session starts
    when the gap to the previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(key).orderBy(*order)
    us = ts_micros(order[0])
    prev = F.lag(us).over(w)
    new_s = (
        prev.isNull() | ((us - prev) > gap_minutes * 60_000_000)
    ).cast("int")
    running = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn("session_id", F.sum(new_s).over(running))


def session_stats(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """(user_id, session_id, n_events, duration_us, total_value):
    per-session aggregates over the sessionized stream."""
    s = sessionize(events, gap_minutes)
    us = ts_micros("ts")
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(us) - F.min(us)).alias("duration_us"),
            decimal_round(F.sum("value"), 2).alias("total_value"),
        )
    )
