from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.scd import scd2_history
from crgp_spark.streaming.scd import (
    final_history,
    stream_scd2,
    write_time_chunks,
)

_T0 = dt.datetime(2024, 3, 1)


def _updates(spark, n_users=6, n_events=120, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n_events):
        rows.append(
            (
                i,
                _T0 + dt.timedelta(minutes=i),
                rng.randrange(n_users),
                rng.choice(["a", "b", "c"]),
            )
        )
    return spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, event_type: string",
    )


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    from crgp_spark.functions import ts_micros

    upd = _updates(spark)
    work = str(tmp_path_factory.mktemp("scd_stream"))
    feed = upd.select(
        "user_id", "event_type", "event_id", ts_micros("ts").alias("us")
    )
    write_time_chunks(feed, work, n_chunks=4)
    emissions = stream_scd2(spark, work)
    return upd, emissions


def test_stream_equals_batch(spark, streamed):
    upd, emissions = streamed
    got = sorted(map(tuple, final_history(emissions).collect()))
    want = sorted(
        map(
            tuple,
            scd2_history(
                upd, "user_id", "ts", ["event_type"], order_cols=["event_id"]
            ).select(
                "user_id", "event_type", "valid_from", "valid_to", "is_current"
            ).collect(),
        )
    )
    assert got == want


def test_state_crosses_batches(spark, streamed):
    """Some version must OPEN in one micro-batch and CLOSE in a later
    one: its [valid_from, valid_to) interval straddles a chunk
    boundary, which only works if the fold kept the open version in
    state across batches (30 events per chunk, 120 total)."""
    upd, emissions = streamed
    from crgp_spark.functions import ts_micros

    us_sorted = [
        r["us"]
        for r in upd.select(ts_micros("ts").alias("us"))
        .orderBy("us", "event_id")
        .collect()
    ]
    boundaries = [us_sorted[29], us_sorted[59], us_sorted[89]]
    hist = final_history(emissions).where(F.col("valid_to").isNotNull())
    straddling = hist.where(
        (F.col("valid_from") <= boundaries[0]) & (F.col("valid_to") > boundaries[0])
        | (F.col("valid_from") <= boundaries[1]) & (F.col("valid_to") > boundaries[1])
        | (F.col("valid_from") <= boundaries[2]) & (F.col("valid_to") > boundaries[2])
    ).count()
    assert straddling > 0


def test_same_timestamp_changes_keep_distinct_versions(spark, tmp_path):
    """Two attribute changes at ONE timestamp must stay two versions
    (version identity = state sequence, not valid_from)."""
    from crgp_spark.functions import ts_micros

    rows = [
        (1, _T0, 1, "a"),
        (2, _T0 + dt.timedelta(minutes=5), 1, "b"),   # same ts as next
        (3, _T0 + dt.timedelta(minutes=5), 1, "c"),
        (4, _T0 + dt.timedelta(minutes=9), 1, "c"),   # no-op
    ]
    upd = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, event_type: string",
    )
    work = str(tmp_path / "ties")
    feed = upd.select(
        "user_id", "event_type", "event_id", ts_micros("ts").alias("us")
    )
    write_time_chunks(feed, work, n_chunks=2)
    got = sorted(
        map(tuple, final_history(stream_scd2(spark, work)).collect())
    )
    want = sorted(
        map(
            tuple,
            scd2_history(
                upd, "user_id", "ts", ["event_type"], order_cols=["event_id"]
            ).select(
                "user_id", "event_type", "valid_from", "valid_to", "is_current"
            ).collect(),
        )
    )
    assert got == want
    assert len(got) == 3  # a, b (same-ts close), c
