from __future__ import annotations

import datetime as dt

import pytest

from crgp_spark.operators.survivor import golden_records

_T0 = dt.datetime(2024, 5, 1)


def _df(spark):
    rows = [
        # cluster 1: b is modal (2x), c is latest
        (1, _T0 + dt.timedelta(minutes=0), 100, "a"),
        (1, _T0 + dt.timedelta(minutes=1), 101, "b"),
        (1, _T0 + dt.timedelta(minutes=2), 102, "b"),
        (1, _T0 + dt.timedelta(minutes=3), 103, "c"),
        # cluster 2: tie a/b on count -> smallest value "a" wins mode;
        # same-ts tie on latest -> higher rid wins
        (2, _T0, 200, "b"),
        (2, _T0, 201, "a"),
        # cluster 3: all-null field -> mode NULL, latest NULL
        (3, _T0, 300, None),
    ]
    return spark.createDataFrame(
        rows, "cid: long, ts: timestamp_ntz, rid: long, v: string"
    )


def test_rules(spark):
    got = {
        r["cid"]: r
        for r in golden_records(
            _df(spark), "cid", "ts", ["rid"],
            latest_cols=["v"], mode_cols=["v"],
        ).collect()
    }
    assert got[1]["n_records"] == 4
    assert got[1]["latest_v"] == "c"
    assert got[1]["mode_v"] == "b"
    assert got[2]["latest_v"] == "a"  # same ts, rid 201 > 200
    assert got[2]["mode_v"] == "a"   # count tie, smallest value
    assert got[3]["latest_v"] is None
    assert got[3]["mode_v"] is None
    span = got[1]["last_us"] - got[1]["first_us"]
    assert span == 180_000_000


def test_validation(spark):
    with pytest.raises(ValueError):
        golden_records(_df(spark), "cid", "ts")
