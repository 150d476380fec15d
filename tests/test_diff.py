from __future__ import annotations

import pytest

from crgp_spark.operators.diff import table_diff


def _old(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", 30.0),
            (4, None, 40.0),
        ],
        "k: long, s: string, x: double",
    )


def _new(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged -> omitted
            (2, "B", 20.0),    # changed
            (4, "", 40.0),     # NULL -> "" is a change
            (5, "e", 50.0),    # added
        ],
        "k: long, s: string, x: double",
    )


def test_diff_statuses(spark):
    got = {
        r["k"]: r["status"]
        for r in table_diff(_old(spark), _new(spark), ["k"]).collect()
    }
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_compare_subset(spark):
    # comparing only x: key 2 and 4 become unchanged
    got = {
        r["k"]: r["status"]
        for r in table_diff(
            _old(spark), _new(spark), ["k"], compare_cols=["x"]
        ).collect()
    }
    assert got == {3: "removed", 5: "added"}


def test_validation(spark):
    with pytest.raises(ValueError):
        table_diff(_old(spark), _new(spark), [])
    with pytest.raises(ValueError):
        table_diff(
            _old(spark).select("k"), _new(spark).select("k"), ["k"]
        )
