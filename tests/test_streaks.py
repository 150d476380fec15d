from __future__ import annotations

import datetime as dt

from crgp_spark.operators.streaks import activity_streaks, longest_streaks

_D0 = dt.datetime(2024, 1, 1, 12, 0, 0)  # epoch day 19723


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (u, _D0 + dt.timedelta(days=d, minutes=m))
            for u, d, m in rows
        ],
        "user_id: long, ts: timestamp_ntz",
    )


def test_islands(spark):
    ev = _events(
        spark,
        [
            # user 1: days 0,1,2 then 5,6 — two islands
            (1, 0, 0), (1, 0, 30), (1, 1, 0), (1, 2, 0), (1, 5, 0), (1, 6, 0),
            # user 2: single day
            (2, 3, 0),
        ],
    )
    got = sorted(
        (r["user_id"], r["start_day"], r["end_day"], r["n_days"])
        for r in activity_streaks(ev).collect()
    )
    base = 19723
    assert got == [
        (1, base + 0, base + 2, 3),
        (1, base + 5, base + 6, 2),
        (2, base + 3, base + 3, 1),
    ]


def test_longest_prefers_longer_then_earlier(spark):
    ev = _events(
        spark,
        [
            # two islands of equal length 2: days 0-1 and 4-5 -> earlier wins
            (1, 0, 0), (1, 1, 0), (1, 4, 0), (1, 5, 0),
            # longer second island: days 0, 3,4,5
            (2, 0, 0), (2, 3, 0), (2, 4, 0), (2, 5, 0),
        ],
    )
    got = {r["user_id"]: r for r in longest_streaks(ev).collect()}
    base = 19723
    assert got[1]["best_n_days"] == 2
    assert got[1]["best_start_day"] == base
    assert got[1]["n_islands"] == 2
    assert got[2]["best_n_days"] == 3
    assert got[2]["best_start_day"] == base + 3


def test_single_exchange(spark):
    ev = _events(spark, [(1, 0, 0), (1, 1, 0)])
    plan = (
        activity_streaks(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
