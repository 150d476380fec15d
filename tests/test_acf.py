"""grouped_acf: python cross-check + degenerate-series handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from crgp_spark.operators.regress import grouped_acf


def _acf_py(ys, k):
    n, mu = len(ys), sum(ys) / len(ys)
    num = sum((ys[t] - mu) * (ys[t + k] - mu) for t in range(n - k))
    den = sum((y - mu) ** 2 for y in ys)
    return num / den


def _run(spark, series, lags=3):
    rows = [("g", i, y) for i, y in enumerate(series)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    return {
        r["lag"]: r
        for r in grouped_acf(
            df, "g", [F.col("t")], F.col("y"), lags=lags
        ).collect()
    }


def test_acf_matches_python(spark):
    series = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    got = _run(spark, series)
    for k in (1, 2, 3):
        assert abs(got[k]["r"] - _acf_py(series, k)) < 1e-12
        assert got[k]["m"] == len(series) - k


def test_acf_alternating_series_is_negative_at_lag1(spark):
    got = _run(spark, [0, 10] * 8)
    assert got[1]["r"] < -0.8
    assert got[2]["r"] > 0.8


def test_acf_constant_series_is_null(spark):
    got = _run(spark, [7] * 6)
    for k in (1, 2, 3):
        assert got[k]["r"] is None and got[k]["den"] == 0


def test_acf_short_series_drops_long_lags(spark):
    got = _run(spark, [1, 2, 3], lags=3)
    assert set(got) == {1, 2}  # lag 3 has no pairs -> no row
