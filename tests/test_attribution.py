from __future__ import annotations

import datetime as dt

import pytest

from crgp_spark.operators.attribution import attribute_conversions

_T0 = dt.datetime(2024, 1, 10, 12, 0, 0)


def _us(t):
    return int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, _T0 + dt.timedelta(seconds=off), uid, typ)
            for i, (off, uid, typ) in enumerate(rows)
        ],
        "event_id: long, ts: timestamp_ntz, user_id: long, event_type: string",
    )


def test_first_last_and_count(spark):
    ev = _events(
        spark,
        [
            (0, 1, "view"),
            (10, 1, "click"),
            (20, 1, "view"),
            (30, 1, "purchase"),
            (40, 1, "click"),  # after the conversion: not counted
        ],
    )
    [r] = attribute_conversions(ev).collect()
    assert r["n_touches"] == 3
    assert r["first_touch_type"] == "view"
    assert r["first_touch_us"] == _us(_T0)
    assert r["last_touch_type"] == "view"
    assert r["last_touch_us"] == _us(_T0 + dt.timedelta(seconds=20))
    assert r["latency_us"] == 10_000_000


def test_lookback_excludes_old_touches(spark):
    ev = _events(
        spark,
        [
            (0, 1, "click"),
            (100, 1, "view"),
            (200, 1, "purchase"),
        ],
    )
    [r] = attribute_conversions(ev, lookback_us=150_000_000).collect()
    assert r["n_touches"] == 1
    assert r["first_touch_type"] == "view"
    assert r["last_touch_type"] == "view"


def test_unattributed_conversion_kept(spark):
    ev = _events(spark, [(0, 1, "error"), (10, 1, "purchase")])
    [r] = attribute_conversions(ev).collect()
    assert r["n_touches"] == 0
    assert r["first_touch_type"] is None and r["last_touch_type"] is None
    assert r["latency_us"] is None


def test_users_isolated_and_multiple_conversions(spark):
    ev = _events(
        spark,
        [
            (0, 1, "click"),
            (5, 2, "view"),
            (10, 1, "purchase"),
            (20, 1, "purchase"),  # sees the same click
            (30, 2, "purchase"),
        ],
    )
    got = {
        (r["user_id"], r["conv_us"]): r
        for r in attribute_conversions(ev).collect()
    }
    assert len(got) == 3
    assert got[(1, _us(_T0 + dt.timedelta(seconds=10)))]["n_touches"] == 1
    assert got[(1, _us(_T0 + dt.timedelta(seconds=20)))]["n_touches"] == 1
    assert (
        got[(2, _us(_T0 + dt.timedelta(seconds=30)))]["first_touch_type"]
        == "view"
    )


def test_tie_broken_by_event_id(spark):
    # two touches at the SAME timestamp: higher event_id wins "last"
    ev = _events(
        spark,
        [
            (0, 1, "view"),   # event_id 0
            (0, 1, "click"),  # event_id 1, same ts
            (10, 1, "purchase"),
        ],
    )
    [r] = attribute_conversions(ev).collect()
    assert r["first_touch_type"] == "view"
    assert r["last_touch_type"] == "click"


def test_validation(spark):
    ev = _events(spark, [(0, 1, "view")])
    with pytest.raises(ValueError):
        attribute_conversions(ev, lookback_us=0)
    with pytest.raises(ValueError):
        attribute_conversions(
            ev, conversion_type="view", touch_types=("view",)
        )
