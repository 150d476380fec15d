"""Out-of-order / late-data watermark semantics (streaming/late.py):
the stream==batch contract parametrized over slicing AND shuffling —
the 27th gated streaming path, and the only order-DEPENDENT one (every
other gated path replays ordered epochs, the reference's own input
contract).

The batch twin `late_batch_twin` replays the empirically measured
rules (one-batch watermark lag for the strict late filter, current
watermark for append-mode emission, ms-floored event-time maxima); the
stream must match it row-for-row, and the fixtures are built so rows
ARE dropped and windows ARE truncated — a vacuous pass (nothing late)
is rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crgp_spark.streaming.late import (
    late_batch_twin,
    stream_late_counts,
    write_shuffled_chunks,
)


def _feed(spark, n=600, span_hours=60):
    """Synthetic events: n rows over span_hours, value = deterministic
    cents, event types cycling."""
    step_us = span_hours * 3_600_000_000 // n
    base = 1_704_067_200_000_000  # 2024-01-01 UTC in micros
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias(
            "event_type"
        ),
        ((F.col("id") * 37 % 1000) / 100.0).alias("value"),
        (F.lit(base) + F.col("id") * step_us).alias("us"),
        F.timestamp_micros(F.lit(base) + F.col("id") * step_us).alias("ts"),
    )


@pytest.mark.parametrize(
    "n_chunks,order,delay_h",
    [
        (4, [1, 0, 3, 2], 6),
        (6, [2, 0, 4, 1, 5, 3], 12),
        (5, [4, 3, 2, 1, 0], 8),  # fully reversed arrival
        (6, [0, 1, 2, 3, 4, 5], 6),  # in-order control: only emit cut
    ],
)
def test_stream_equals_batch_filter(spark, tmp_path, n_chunks, order, delay_h):
    feed = _feed(spark).localCheckpoint(eager=True)
    work = str(tmp_path / "late_feed")
    write_shuffled_chunks(feed, work, order)
    got = sorted(
        map(
            tuple,
            stream_late_counts(
                spark, work, window="1 hour", delay=f"{delay_h} hours"
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            late_batch_twin(
                feed,
                n_chunks,
                order,
                window_us=3_600_000_000,
                delay_ms=delay_h * 3_600_000,
            ).collect(),
        )
    )
    assert got == want
    assert len(got) > 0


def test_late_rows_are_actually_dropped(spark, tmp_path):
    """Non-vacuousness: the reversed-arrival fixture must drop rows —
    the accepted total is strictly below the raw total — and the final
    watermark must truncate trailing windows."""
    feed = _feed(spark).localCheckpoint(eager=True)
    order = [4, 3, 2, 1, 0]
    work = str(tmp_path / "late_feed2")
    write_shuffled_chunks(feed, work, order)
    out = stream_late_counts(spark, work, window="1 hour", delay="8 hours")
    accepted = out.agg(F.sum("n_events")).collect()[0][0] or 0
    total = feed.count()
    assert 0 < accepted < total
    # trailing windows (after the final watermark) never emit
    last_start = out.agg(F.max("window_start")).collect()[0][0]
    max_us = feed.agg(F.max("us")).collect()[0][0]
    final_wm_us = (max_us // 1000 - 8 * 3_600_000) * 1000
    assert (last_start + 3600) * 1_000_000 <= final_wm_us


def test_in_order_stream_only_emit_cut(spark, tmp_path):
    """With ordered arrival nothing is ever late: the stream equals the
    plain batch aggregation restricted to windows closed by the final
    watermark."""
    feed = _feed(spark).localCheckpoint(eager=True)
    order = [0, 1, 2, 3]
    work = str(tmp_path / "late_feed3")
    write_shuffled_chunks(feed, work, order)
    got = sorted(
        map(
            tuple,
            stream_late_counts(
                spark, work, window="1 hour", delay="6 hours"
            ).collect(),
        )
    )
    max_us = feed.agg(F.max("us")).collect()[0][0]
    final_wm_us = (max_us // 1000 - 6 * 3_600_000) * 1000
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    ws = (F.col("us") - F.col("us") % 3_600_000_000).cast("long")
    want = sorted(
        map(
            tuple,
            feed.withColumn("_ws", ws)
            .filter(F.col("_ws") + 3_600_000_000 <= F.lit(final_wm_us))
            .groupBy("_ws", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(cents).alias("total_cents"),
            )
            .select(
                (F.col("_ws") / 1_000_000).cast("long").alias("window_start"),
                "event_type",
                "n_events",
                "total_cents",
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0
