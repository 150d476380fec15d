from __future__ import annotations

import pytest

from crgp_spark.operators.profile import check_constraints, profile_table


def _df(spark):
    rows = [
        (1, "a", 1.5),
        (2, "b", None),
        (3, None, 2.5),
        (3, "a", 0.5),
    ]
    return spark.createDataFrame(rows, "k: long, s: string, x: double")


def test_profile_basic(spark):
    got = {r["column"]: r for r in profile_table(_df(spark)).collect()}
    assert set(got) == {"k", "s", "x"}
    k = got["k"]
    assert (k["n_rows"], k["n_nonnull"], k["n_nulls"], k["n_distinct"]) == (
        4, 4, 0, 3,
    )
    assert (k["min_value"], k["max_value"]) == ("1", "3")
    s = got["s"]
    assert (s["n_nonnull"], s["n_nulls"], s["n_distinct"]) == (3, 1, 2)
    assert (s["min_value"], s["max_value"]) == ("a", "b")
    x = got["x"]
    # native-type ordering: 0.5 is the min, not "0.5" vs "1.5" lexicographic
    assert float(x["min_value"]) == 0.5 and float(x["max_value"]) == 2.5


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k: long, s: string")
    got = {r["column"]: r for r in profile_table(df, ["s"]).collect()}
    s = got["s"]
    assert (s["n_nonnull"], s["n_distinct"]) == (0, 0)
    assert s["min_value"] is None and s["max_value"] is None


def test_profile_validates_columns(spark):
    with pytest.raises(ValueError):
        profile_table(_df(spark), ["nope"])
    with pytest.raises(ValueError):
        profile_table(_df(spark), [])


def test_checks(spark):
    got = {
        r["check"]: r
        for r in check_constraints(
            _df(spark),
            [
                ("k_positive", "k > 0"),
                ("s_not_null", "s IS NOT NULL"),
                ("x_small", "x < 2.0"),  # NULL x counts as a violation
            ],
        ).collect()
    }
    assert got["k_positive"]["n_violations"] == 0
    assert got["k_positive"]["passed"] is True
    assert got["s_not_null"]["n_violations"] == 1
    assert got["s_not_null"]["passed"] is False
    # x: 1.5 ok, NULL violation, 2.5 violation, 0.5 ok
    assert got["x_small"]["n_violations"] == 2


def test_checks_validate_input(spark):
    with pytest.raises(ValueError):
        check_constraints(_df(spark), [])
    with pytest.raises(ValueError):
        check_constraints(_df(spark), [("a", "k > 0"), ("a", "k < 9")])


def test_single_job_no_shuffle_of_rows(spark):
    """Profiling is one aggregate over the scan: the executed plan
    must contain partial aggregation and no join."""
    plan = (
        profile_table(_df(spark), ["k", "s"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
