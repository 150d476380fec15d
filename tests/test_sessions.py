from __future__ import annotations

import datetime as dt

from crgp_spark.operators.sessions import session_stats, sessionize


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


def test_sessionize_gap_semantics(spark):
    rows = [
        # user 1: events at 0, 10, 50, 55 min -> sessions {0,10}, {50,55}
        (1, 1, _ts(0), 1.0),
        (2, 1, _ts(10), 2.0),
        (3, 1, _ts(50), 3.0),
        (4, 1, _ts(55), 4.0),
        # user 2: single event
        (5, 2, _ts(0), 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = sessionize(ev, gap_minutes=30).collect()
    sid = {r.event_id: r.session_id for r in out}
    assert sid[1] == sid[2] == 1
    assert sid[3] == sid[4] == 2
    assert sid[5] == 1

    stats = {
        (r.user_id, r.session_id): (r.n_events, r.duration_us, r.total_value)
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert stats[(1, 1)] == (2, 10 * 60_000_000, 3.0)
    assert stats[(1, 2)] == (2, 5 * 60_000_000, 7.0)
    assert stats[(2, 1)] == (1, 0, 5.0)


def test_exact_gap_is_same_session(spark):
    """A gap of exactly 30 min does NOT start a new session (strict >)."""
    rows = [(1, 1, _ts(0), 0.0), (2, 1, _ts(30), 0.0), (3, 1, _ts(60.001), 0.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    sid = {r.event_id: r.session_id for r in sessionize(ev, 30).collect()}
    assert sid[1] == sid[2]
    assert sid[3] == sid[2] + 1
