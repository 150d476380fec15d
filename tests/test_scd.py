from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.scd import scd2_history


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _updates(spark):
    rows = [
        # key "a": v1 -> v1 (dup, collapsed) -> v2 -> v1 again
        (1, _ts("2024-01-01T00:00:00"), "v1", 10),
        (1, _ts("2024-01-02T00:00:00"), "v1", 11),
        (1, _ts("2024-01-03T00:00:00"), "v2", 12),
        (1, _ts("2024-01-04T00:00:00"), "v1", 13),
        # key "b": single version
        (2, _ts("2024-01-01T12:00:00"), "x", 20),
        # key "c": NULL attribute versions correctly
        (3, _ts("2024-01-01T00:00:00"), None, 30),
        (3, _ts("2024-01-02T00:00:00"), None, 31),
        (3, _ts("2024-01-03T00:00:00"), "y", 32),
    ]
    return spark.createDataFrame(
        rows, "k: long, ts: timestamp_ntz, attr: string, uid: long"
    )


def _us(s):
    return int(_ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_versions_and_intervals(spark):
    got = {
        (r["k"], r["attr"], r["valid_from"]): (r["valid_to"], r["is_current"])
        for r in scd2_history(
            _updates(spark), "k", "ts", ["attr"], order_cols=["uid"]
        ).collect()
    }
    assert len(got) == 6
    assert got[(1, "v1", _us("2024-01-01T00:00:00"))] == (
        _us("2024-01-03T00:00:00"),
        False,
    )
    assert got[(1, "v2", _us("2024-01-03T00:00:00"))] == (
        _us("2024-01-04T00:00:00"),
        False,
    )
    assert got[(1, "v1", _us("2024-01-04T00:00:00"))] == (None, True)
    assert got[(2, "x", _us("2024-01-01T12:00:00"))] == (None, True)
    # NULL -> NULL collapsed; NULL -> "y" is a change
    assert got[(3, None, _us("2024-01-01T00:00:00"))] == (
        _us("2024-01-03T00:00:00"),
        False,
    )


def test_exactly_one_current_per_key(spark):
    hist = scd2_history(
        _updates(spark), "k", "ts", ["attr"], order_cols=["uid"]
    )
    per_key = (
        hist.groupBy("k")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_cur"))
        .collect()
    )
    assert all(r["n_cur"] == 1 for r in per_key)


def test_multi_tracked_columns(spark):
    hist = scd2_history(
        _updates(spark), "k", "ts", ["attr", "uid"], order_cols=["uid"]
    )
    # uid changes every row, so nothing collapses
    assert hist.count() == 8


def test_requires_tracked_cols(spark):
    with pytest.raises(ValueError):
        scd2_history(_updates(spark), "k", "ts", [])


def test_single_shuffle_plan(spark):
    """Both window passes must share one exchange on the key."""
    hist = scd2_history(
        _updates(spark), "k", "ts", ["attr"], order_cols=["uid"]
    )
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
