"""MAD outlier detection (crgp_spark/operators/robust.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crgp_spark.operators.robust import mad_flag, mad_summary


def _summary(spark, rows, nsig=3.0):
    df = spark.createDataFrame(rows, "k: string, v: long")
    out = mad_summary(df, "k", F.col("v"), nsig=nsig)
    return {
        r["k"]: (r["n"], r["med2x"], r["mad2x"], r["n_out"])
        for r in out.collect()
    }


def test_single_wild_value_flagged(spark):
    rows = [("a", v) for v in [10, 11, 12, 13, 14, 1000]]
    # med = 12.5, devs = [2.5,1.5,.5,.5,1.5,987.5], MAD = 1.5
    got = _summary(spark, rows)
    assert got["a"] == (6, 25, 3, 1)


def test_mean_would_have_missed_it(spark):
    # classic robustness: the 1000 drags the mean to ~176 so a
    # 3-sigma-of-mean rule flags nothing; MAD still isolates it
    vals = [10, 11, 12, 13, 14, 1000]
    mean = sum(vals) / len(vals)
    sd = (sum((v - mean) ** 2 for v in vals) / len(vals)) ** 0.5
    assert not any(abs(v - mean) > 3 * sd for v in vals)
    assert _summary(spark, [("a", v) for v in vals])["a"][3] == 1


def test_zero_mad_flags_any_deviation(spark):
    rows = [("a", 5)] * 5 + [("a", 6)]
    got = _summary(spark, rows)
    assert got["a"] == (6, 10, 0, 1)


def test_boundary_value_not_flagged(spark):
    # dev == nsig * MAD exactly -> NOT an outlier (strict >)
    rows = [("a", v) for v in [0, 1, 2, 3, 4]]  # med 2, MAD 1
    got = _summary(spark, rows, nsig=2.0)
    assert got["a"][3] == 0  # max dev is 2 == 2*1


def test_groups_independent(spark):
    rows = [("a", 1), ("a", 1), ("a", 100), ("b", 100), ("b", 100), ("b", 1)]
    got = _summary(spark, rows)
    assert got["a"][3] == 1 and got["b"][3] == 1


def test_flag_preserves_rows(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2)], "k: string, v: long")
    out = mad_flag(df, "k", F.col("v")).collect()
    assert len(out) == 2 and all("is_outlier" in r.asDict() for r in out)
