"""As-of join semantics: backward lookup, equal-ts visibility, nulls."""

from __future__ import annotations

from crgp_spark.operators.asof import asof_join


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 25), (4, "b", 5), (5, "c", 9)],
        "event_id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 10, 100.0), ("a", 21, 210.0), ("b", 6, 60.0)],
        "k string, t long, v double",
    )
    out = {
        r["event_id"]: r["v_asof"]
        for r in asof_join(left, right, on="k", ts="t", right_cols=["v"]).collect()
    }
    assert out == {
        1: 100.0,  # right row AT the left ts is visible
        2: 100.0,  # 21 > 20: not yet visible
        3: 210.0,
        4: None,  # right row later than the left row
        5: None,  # key absent on the right
    }


def test_asof_equal_ts_ties_resolve_to_last_payload(spark):
    left = spark.createDataFrame([(1, "a", 10)], "event_id long, k string, t long")
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 10, 2.0)], "k string, t long, v double"
    )
    row = asof_join(left, right, on="k", ts="t", right_cols=["v"]).collect()[0]
    assert row["v_asof"] == 2.0
