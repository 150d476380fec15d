"""Resample + forward fill (crgp_spark/operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crgp_spark.operators.timeseries import DAY_US, resample_ffill


def _ts(day: int, sec: int = 0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=day, seconds=sec)


def _run(spark, rows, step_us=DAY_US):
    df = spark.createDataFrame(
        rows, "k: long, ts: timestamp_ntz, v: long, seq: long"
    )
    out = resample_ffill(df, key="k", ts="ts", val=F.col("v"), seq="seq",
                         step_us=step_us)
    return sorted((r["k"], r["bucket"], r["val"]) for r in out.collect())


BASE_DAY = 19723  # 2024-01-01 in days since epoch


def test_gaps_filled_forward(spark):
    rows = [
        (1, _ts(0), 10, 1),
        (1, _ts(3), 30, 2),  # days 1-2 must carry 10
        (2, _ts(1), 7, 3),
    ]
    assert _run(spark, rows) == [
        (1, BASE_DAY + 0, 10),
        (1, BASE_DAY + 1, 10),
        (1, BASE_DAY + 2, 10),
        (1, BASE_DAY + 3, 30),
        (2, BASE_DAY + 1, 7),
    ]


def test_last_observation_wins_within_bucket(spark):
    rows = [
        (1, _ts(0, 10), 5, 1),
        (1, _ts(0, 20), 9, 2),   # later ts wins
        (1, _ts(0, 20), 4, 3),   # same ts: larger seq wins
    ]
    assert _run(spark, rows) == [(1, BASE_DAY, 4)]


def test_single_observation_is_single_row(spark):
    assert _run(spark, [(9, _ts(5), 1, 1)]) == [(9, BASE_DAY + 5, 1)]


def test_hourly_step(spark):
    rows = [(1, _ts(0, 0), 1, 1), (1, _ts(0, 3 * 3600 + 5), 2, 2)]
    got = _run(spark, rows, step_us=3_600_000_000)
    h0 = BASE_DAY * 24
    assert got == [(1, h0, 1), (1, h0 + 1, 1), (1, h0 + 2, 1), (1, h0 + 3, 2)]


def test_midnight_minus_one_micro_stays_in_its_day(spark):
    rows = [(1, _ts(1) - dt.timedelta(microseconds=1), 3, 1)]
    assert _run(spark, rows) == [(1, BASE_DAY, 3)]
