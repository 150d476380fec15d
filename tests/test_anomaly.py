from __future__ import annotations

import datetime as dt

import pytest

from crgp_spark.operators.anomaly import rolling_anomalies

_T0 = dt.datetime(2024, 6, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, _T0 + dt.timedelta(hours=h), u, v)
            for i, (h, u, v) in enumerate(rows)
        ],
        "event_id: long, ts: timestamp_ntz, user_id: long, value: double",
    )


def test_spike_flagged(spark):
    rows = [(h, 1, 10.0) for h in range(10)] + [(10, 1, 500.0)]
    got = rolling_anomalies(_events(spark, rows), min_n=8).collect()
    assert [r["event_id"] for r in got] == [10]
    assert got[0]["cents"] == 50000
    assert got[0]["n_window"] == 11


def test_steady_stream_not_flagged(spark):
    rows = [(h, 1, 10.0 + (h % 3)) for h in range(20)]
    assert rolling_anomalies(_events(spark, rows), min_n=8).count() == 0


def test_window_expiry_resets_baseline(spark):
    # spike at hour 0; after the 7-day window passes, same value again
    # is baseline-relative: a second identical spike at day 8 has only
    # the flat tail in its window (plus itself) and IS flagged
    rows = (
        [(0, 1, 500.0)]
        + [(100 + h, 1, 10.0) for h in range(12)]
        + [(8 * 24, 1, 500.0)]
    )
    got = rolling_anomalies(_events(spark, rows), min_n=8).collect()
    # first spike has n=1 < min_n; the flats' windows contain the
    # spike (variance inflated, nothing flags); the second spike's
    # window holds only the flat tail + itself -> flagged
    assert {r["event_id"] for r in got} == {13}


def test_min_n_guard(spark):
    rows = [(0, 1, 10.0), (1, 1, 10.0), (2, 1, 900.0)]
    assert rolling_anomalies(_events(spark, rows), min_n=8).count() == 0


def test_users_isolated(spark):
    rows = [(h, 1, 10.0) for h in range(10)] + [(5, 2, 500.0)]
    assert rolling_anomalies(_events(spark, rows), min_n=8).count() == 0


def test_validation(spark):
    ev = _events(spark, [(0, 1, 1.0)])
    with pytest.raises(ValueError):
        rolling_anomalies(ev, window_us=0)
    with pytest.raises(ValueError):
        rolling_anomalies(ev, min_n=1)
