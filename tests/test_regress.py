"""Grouped OLS trend (crgp_spark/operators/regress.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from crgp_spark.operators.regress import grouped_trend


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k: long, x: long, y: long")
    out = grouped_trend(df, "k", F.col("x"), F.col("y"))
    return {
        r["k"]: (r["n"], r["num"], r["den"], r["slope"])
        for r in out.collect()
    }


def _py_fit(pts):
    xs = [x for x, _ in pts]
    ys = [y for _, y in pts]
    mn = min(xs)
    xs = [x - mn for x in xs]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    return (n, num, den, num / den if den else None)


def test_exact_line_recovered(spark):
    rows = [(1, x, 3 * x + 7) for x in range(10)]
    n, num, den, slope = _run(spark, rows)[1]
    assert slope == 3.0 and num == 3 * den


def test_matches_python_reference_per_group(spark):
    rows = []
    for i in range(300):
        h = hashlib.md5(f"t:{i}".encode()).digest()
        rows.append((h[0] % 5, h[1] % 40, h[2] * 17 % 1000))
    got = _run(spark, rows)
    for k in got:
        pts = [(x, y) for kk, x, y in rows if kk == k]
        assert got[k] == _py_fit(pts)


def test_constant_x_gives_null_slope(spark):
    got = _run(spark, [(1, 5, 10), (1, 5, 20)])
    assert got[1][3] is None and got[1][2] == 0


def test_shift_invariance(spark):
    a = _run(spark, [(1, x, x * x) for x in range(8)])
    b = _run(spark, [(1, x + 10_000, x * x) for x in range(8)])
    assert a[1] == b[1]


def test_single_point_group(spark):
    got = _run(spark, [(9, 3, 42)])
    assert got[9] == (1, 0, 0, None)
