from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.discovery import column_sketches, join_candidates


def _tables(spark):
    dim = spark.range(40).select(F.col("id").alias("pk"))
    fact = spark.createDataFrame(
        [(i % 30,) for i in range(300)], "fk: long"
    )
    other = spark.range(1000, 1040).select(F.col("id").alias("x"))
    return dim, fact, other


def test_fk_containment_detected(spark):
    dim, fact, other = _tables(spark)
    sk = column_sketches(
        {"dim.pk": (dim, "pk"), "fact.fk": (fact, "fk"),
         "other.x": (other, "x")},
        k=64,
    )
    got = {
        (r["col_a"], r["col_b"]): r
        for r in join_candidates(sk, k=64).collect()
    }
    # below k on every side -> everything exact
    r = got[("dim.pk", "fact.fk")]
    assert (r["est_a"], r["est_b"], r["est_common"]) == (40.0, 30.0, 30.0)
    assert r["containment"] == 0.75       # 30/40 of pk values appear
    r2 = got[("dim.pk", "other.x")]
    assert r2["est_common"] == 0.0 and r2["containment"] == 0.0


def test_estimator_path_reasonable(spark):
    dim = spark.range(2000).select(F.col("id").alias("pk"))
    fact = spark.createDataFrame(
        [(i % 2000,) for i in range(4000)], "fk: long"
    )
    sk = column_sketches({"d": (dim, "pk"), "f": (fact, "fk")}, k=64)
    [r] = join_candidates(sk, k=64).collect()
    # true distincts 2000/2000, full overlap: estimates within ~30%
    assert 1300 < r["est_a"] < 2800
    assert 0.6 < r["containment"] <= 1.6


def test_validation(spark):
    with pytest.raises(ValueError):
        column_sketches({})
