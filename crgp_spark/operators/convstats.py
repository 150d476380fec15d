"""Per-conversation profile over the transcripts payload.

The reference's statistics pass aggregates per-cascade counters after
reconstruction (``statistics.rs:17-131``); this operator is the same
idea applied one level earlier — a single-pass profile of every
conversation in the *input* table (turn counts, role mix, text volume,
wall-clock span, role-switch cadence). A curation pipeline uses it to
gate which conversations are worth deriving edges from at all.

Scale shape: one hash shuffle on ``conv_id`` shared by the LAG window
and the groupBy (Spark reuses the window's hash partitioning for the
aggregation, so the whole profile is one exchange + one scan).
Integer-exact everywhere: character counts, microsecond spans, switch
counters — no floating-point aggregation, so the DuckDB twin matches
bit-for-bit at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import ts_micros


def conversation_profile(turns: DataFrame) -> DataFrame:
    """Profile each conversation of a transcripts table.

    Input columns (FIXTURES.md §6): ``conv_id, turn_idx, role, text, ts``.

    Returns one row per ``conv_id``:

    - ``n_turns``      — turn count (bigint)
    - ``n_roles``      — distinct roles seen (bigint)
    - ``total_chars``  — sum of ``length(text)`` (bigint)
    - ``max_turn_chars`` — longest single turn (int)
    - ``first_role`` / ``last_role`` — role at the min/max ``turn_idx``
      (``min_by``/``max_by`` — no sort, no struct-min SortAggregate)
    - ``n_switches``   — adjacent turn pairs whose role differs (bigint)
    - ``duration_us``  — microseconds between first and last turn (bigint)
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        F.length("text").alias("chars"),
        ts_micros("ts").alias("us"),
    ).withColumn("prev_role", F.lag("role").over(w))
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.sum("chars").alias("total_chars"),
        F.max("chars").alias("max_turn_chars"),
        F.min_by("role", "turn_idx").alias("first_role"),
        F.max_by("role", "turn_idx").alias("last_role"),
        F.count(
            F.when(
                F.col("prev_role").isNotNull()
                & (F.col("role") != F.col("prev_role")),
                1,
            )
        ).alias("n_switches"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )
