"""Conversion attribution over an event log (first-touch / last-touch
in one pass).

The standard product-analytics question downstream of the funnel
(`cohort.funnel_counts`): for every conversion event, which preceding
touch event gets the credit?  Answered with one banded interval join —
conversions against touches of the same user with ``touch.ts`` in
``[conv.ts - lookback, conv.ts)`` — then one grouped aggregation that
extracts the first touch, the last touch and the touch count
simultaneously via ``min_by``/``max_by``.

Determinism: the argmin/argmax key is ``lpad(micros) || ':' ||
lpad(event_id)`` — zero-padded so lexicographic order == numeric
order (the composite-key idiom; DuckDB's ``ARG_MIN`` takes no struct
keys, so the oracle uses the identical string).

Scale shape at 100 TB: ONE exchange of each side on the user key; the
join fan-out is bounded by the lookback window (touches per user per
window), and the post-join rollup is map-side combinable.  Heavy
users are ordinary AQE skew-join territory — the same posture as
`sessions.sessionize`.  A last-touch-only variant could run as a pure
running window (no join); this operator pays the join to answer
first/last/count together.

No reference counterpart — events-family analytics beyond the
reference's scope.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ord_key(us: F.Column, event_id: F.Column) -> F.Column:
    from crgp_spark.functions import ord_key

    return ord_key(us, event_id)


def attribute_conversions(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view"),
    lookback_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Per conversion: ``(event_id, user_id, conv_us, n_touches,
    first_touch_type, first_touch_us, last_touch_type, last_touch_us,
    latency_us)``.  Conversions with no in-window touch keep NULL
    touch columns (and count 0) — they stay visible as unattributed.
    ``latency_us`` = conversion minus last touch."""
    if lookback_us <= 0:
        raise ValueError("lookback_us must be positive")
    if conversion_type in set(touch_types):
        raise ValueError("conversion_type cannot also be a touch type")
    from crgp_spark.functions import ts_micros

    base = events.select(
        "event_id",
        "user_id",
        "event_type",
        ts_micros("ts").alias("us"),
    )
    conv = base.where(F.col("event_type") == conversion_type).select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("us").alias("conv_us"),
    )
    touch = base.where(F.col("event_type").isin(list(touch_types))).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("t_type"),
        F.col("us").alias("t_us"),
        F.col("event_id").alias("t_id"),
    )
    joined = conv.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_us") < F.col("conv_us"))
        & (F.col("t_us") >= F.col("conv_us") - F.lit(lookback_us)),
        "left",
    )
    key = _ord_key(F.col("t_us"), F.col("t_id"))
    return (
        joined.groupBy("event_id", "user_id", "conv_us")
        .agg(
            F.count(F.col("t_id")).alias("n_touches"),
            F.min_by(F.col("t_type"), key).alias("first_touch_type"),
            F.min(F.col("t_us")).alias("first_touch_us"),
            F.max_by(F.col("t_type"), key).alias("last_touch_type"),
            F.max(F.col("t_us")).alias("last_touch_us"),
        )
        .withColumn("latency_us", F.col("conv_us") - F.col("last_touch_us"))
    )
