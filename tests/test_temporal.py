from __future__ import annotations

import datetime as dt

import pytest

from crgp_spark.operators.scd import scd2_history
from crgp_spark.operators.temporal import scd2_join

_T0 = dt.datetime(2024, 7, 1)


def _updates(spark):
    rows = [
        (1, _T0 + dt.timedelta(days=0), 1, "bronze"),
        (2, _T0 + dt.timedelta(days=10), 1, "silver"),
        (3, _T0 + dt.timedelta(days=20), 1, "gold"),
        (4, _T0 + dt.timedelta(days=0), 2, "bronze"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, event_type: string",
    )


def _facts(spark):
    rows = [
        (100, 1, _T0 + dt.timedelta(days=5)),    # bronze era
        (101, 1, _T0 + dt.timedelta(days=10)),   # boundary: silver starts
        (102, 1, _T0 + dt.timedelta(days=25)),   # gold (open version)
        (103, 1, _T0 - dt.timedelta(days=1)),    # before first version
        (104, 9, _T0 + dt.timedelta(days=5)),    # unknown key
    ]
    return spark.createDataFrame(
        rows, "fid: long, user_id: long, ts: timestamp_ntz"
    )


def test_active_version_join(spark):
    dim = scd2_history(
        _updates(spark), "user_id", "ts", ["event_type"],
        order_cols=["event_id"],
    )
    got = {
        r["fid"]: r["dim_event_type"]
        for r in scd2_join(_facts(spark), dim, "user_id", "ts").collect()
    }
    assert got == {
        100: "bronze",
        101: "silver",  # boundary takes the NEWER version
        102: "gold",
        103: None,      # before history starts
        104: None,      # unknown key
    }


def test_each_fact_matches_at_most_one_version(spark):
    dim = scd2_history(
        _updates(spark), "user_id", "ts", ["event_type"],
        order_cols=["event_id"],
    )
    out = scd2_join(_facts(spark), dim, "user_id", "ts")
    assert out.count() == 5  # no interval overlap fan-out


def test_micros_fact_column(spark):
    from crgp_spark.functions import ts_micros

    dim = scd2_history(
        _updates(spark), "user_id", "ts", ["event_type"],
        order_cols=["event_id"],
    )
    facts = _facts(spark).select(
        "fid", "user_id", ts_micros("ts").alias("us")
    )
    got = {
        r["fid"]: r["dim_event_type"]
        for r in scd2_join(facts, dim, "user_id", "us").collect()
    }
    assert got[100] == "bronze" and got[102] == "gold"


def test_validation(spark):
    with pytest.raises(ValueError):
        scd2_join(_facts(spark), _updates(spark), "user_id", "ts")
