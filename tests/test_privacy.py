"""k-anonymity operators (crgp_spark/operators/privacy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.privacy import generalize_until_k, k_anonymity_risk


def _df(spark):
    # ages: 30 appears 3x, 40 twice, 50 once; city constant
    rows = [(30, "x"), (30, "x"), (30, "x"), (40, "x"), (40, "x"), (50, "x")]
    return spark.createDataFrame(rows, "age: long, city: string")


def test_risk_flags_small_classes(spark):
    got = {
        (r["age"], r["n"], r["at_risk"])
        for r in k_anonymity_risk(_df(spark), ["age"], k=3).collect()
    }
    assert got == {(30, 3, False), (40, 2, True), (50, 1, True)}


def test_ladder_picks_first_passing_level(spark):
    ladder = [
        {"a": F.col("age")},                      # 40/50 classes < 3
        {"a": F.col("age") - F.col("age") % 20},  # 20:{30}=3, 40:{40,50}=3
    ]
    level, classes = generalize_until_k(_df(spark), ladder, k=3)
    assert level == 1
    assert sorted((r["a"], r["n"]) for r in classes.collect()) == [
        (20, 3), (40, 3),
    ]


def test_exhausted_ladder_raises(spark):
    with pytest.raises(ValueError, match="no ladder level"):
        generalize_until_k(_df(spark), [{"a": F.col("age")}], k=4)


def test_max_at_risk_tolerance(spark):
    level, _ = generalize_until_k(
        _df(spark), [{"a": F.col("age")}], k=3, max_at_risk=2
    )
    assert level == 0


def test_mismatched_ladder_columns_raise(spark):
    with pytest.raises(ValueError, match="disagree"):
        generalize_until_k(
            _df(spark), [{"a": F.col("age")}, {"b": F.col("age")}], k=2
        )


def test_validates_k(spark):
    with pytest.raises(ValueError, match="k >= 1"):
        k_anonymity_risk(_df(spark), ["age"], k=0)
