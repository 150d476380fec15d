"""Cohort retention + funnel: hand-computed expectations, boundary ties."""

from __future__ import annotations

from datetime import datetime, timedelta

from crgp_spark.operators.cohort import cohort_retention, funnel_counts

_SCHEMA = ("event_id long, ts timestamp_ntz, user_id long,"
           " event_type string, value double, props string")


def _ev(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_retention_triangle(spark):
    d0 = datetime(2024, 1, 1, 12, 0)
    rows = [
        # user 1: days 0, 1, 3 ; user 2: days 0, 1 ; user 3: day 1 only
        (1, d0, 1, "view", 0.0, None),
        (2, d0 + timedelta(days=1), 1, "view", 0.0, None),
        (3, d0 + timedelta(days=3), 1, "view", 0.0, None),
        (4, d0, 2, "view", 0.0, None),
        (5, d0 + timedelta(days=1, hours=5), 2, "view", 0.0, None),
        (6, d0 + timedelta(days=1), 3, "view", 0.0, None),
    ]
    got = {
        (r["cohort_day"] - 19723, r["offset_days"]): r["n_users"]
        for r in cohort_retention(_ev(spark, rows)).collect()
    }  # 2024-01-01 = epoch day 19723
    assert got == {(0, 0): 2, (0, 1): 2, (0, 3): 1, (1, 0): 1}


def test_funnel_order_and_ties(spark):
    d0 = datetime(2024, 1, 1)
    rows = [
        # user 1 completes in order; view shares signup's timestamp (tie
        # counts: first-touch >= semantics)
        (1, d0, 1, "signup", 0.0, None),
        (2, d0, 1, "view", 0.0, None),
        (3, d0 + timedelta(hours=1), 1, "click", 0.0, None),
        (4, d0 + timedelta(hours=2), 1, "purchase", 0.0, None),
        # user 2: purchase BEFORE click -> drops at the last stage
        (5, d0, 2, "signup", 0.0, None),
        (6, d0 + timedelta(hours=1), 2, "view", 0.0, None),
        (7, d0 + timedelta(hours=3), 2, "click", 0.0, None),
        (8, d0 + timedelta(hours=2), 2, "purchase", 0.0, None),
        # user 3: never signed up -> counted nowhere
        (9, d0, 3, "view", 0.0, None),
    ]
    row = funnel_counts(_ev(spark, rows)).collect()[0]
    assert (row["n_signup"], row["n_view"], row["n_click"],
            row["n_purchase"]) == (2, 2, 2, 1)


def test_adoption_curve(spark):
    import datetime as dt

    from crgp_spark.operators.cohort import adoption_curve

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0),                            # day 0: users 1, 2
        (2, t0 + dt.timedelta(hours=5)),
        (1, t0 + dt.timedelta(days=1)),     # day 1: no NEW users
        (3, t0 + dt.timedelta(days=2)),     # day 2: user 3
    ]
    ev = spark.createDataFrame(rows, "user_id: long, ts: timestamp_ntz")
    got = sorted(
        (r["day"], r["new_users"], r["cum_users"])
        for r in adoption_curve(ev).collect()
    )
    base = 19723
    assert got == [(base, 2, 2), (base + 2, 1, 3)]
