"""cusum_chart: closed-form == Page recursion, shift detection,
rational drift/threshold handling, alarm summary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.cusum import cusum_alarms, cusum_chart


def _chart(spark, xs, **kw):
    rows = [("g", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    ch = cusum_chart(df, ["g"], [F.col("t")], F.col("x"), **kw)
    return sorted(
        (d["rn"], d["cusum_scaled"], d.get("alarm"))
        for d in (r.asDict() for r in ch.collect())
    )


def _page_recursion(xs, k_num, k_den):
    c, out = 0, []
    for x in xs:
        c = max(0, c + (x * k_den - k_num))
        out.append(c)
    return out


def test_closed_form_equals_page_recursion(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]
    got = _chart(spark, xs, k_num=9, k_den=2)  # k = 4.5
    want = _page_recursion(xs, 9, 2)
    assert [c for _, c, _ in got] == want


def test_level_shift_raises_alarm_after_shift_only(spark):
    xs = [5] * 20 + [9] * 10  # shift at t=20; k=6 -> drift +3 after
    got = _chart(spark, xs, k_num=6, k_den=1, h_num=8, h_den=1)
    alarms = [rn for rn, _, a in got if a]
    assert alarms and min(alarms) > 20
    # before the shift the statistic stays at zero (x - k < 0)
    assert all(c == 0 for rn, c, _ in got if rn <= 20)


def test_alarm_threshold_is_rational_exact(spark):
    # cusum_scaled is in x*k_den units; alarm iff cus/k_den > h_num/h_den
    xs = [10, 10]  # k = 9.5 -> terms +0.5 -> cus = 1, 2 (scaled: 1,2 /2)
    got = _chart(spark, xs, k_num=19, k_den=2, h_num=1, h_den=2)
    # cus_value = 0.5 then 1.0; threshold 0.5 -> strict > fires only at rn 2
    assert [(rn, a) for rn, _, a in got] == [(1, False), (2, True)]


def test_alarm_summary_first_and_count(spark):
    xs = [0] * 5 + [10] * 5
    rows = [("g", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    ch = cusum_chart(
        df, ["g"], [F.col("t")], F.col("x"), k_num=5, k_den=1,
        h_num=7, h_den=1,
    )
    got = cusum_alarms(ch, ["g"]).collect()
    assert len(got) == 1
    # cus after shift: 5,10,15,... alarm (>7) from the 2nd shifted row on
    assert got[0]["first_alarm_rn"] == 7 and got[0]["n_alarms"] == 4


def test_rejects_bad_denominators(spark):
    df = spark.createDataFrame([("g", 0, 1)], "g string, t long, x long")
    with pytest.raises(ValueError):
        cusum_chart(df, ["g"], [F.col("t")], F.col("x"), k_num=1, k_den=0)
