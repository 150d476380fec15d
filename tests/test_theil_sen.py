"""theil_sen: parity with a pure-Python brute force, outlier
robustness vs OLS, exact line recovery."""

from __future__ import annotations

import random

from crgp_spark.operators.regress import theil_sen


def _brute(pts):
    slopes = [
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
        if x2 != x1
    ]

    def med(vs):
        vs = sorted(vs)
        n = len(vs)
        lo, hi = (n + 1) // 2 - 1, n // 2
        return (vs[lo] + vs[hi]) / 2

    s = med(slopes)
    return len(slopes), s, med([y - s * x for x, y in pts])


def test_matches_bruteforce(spark):
    rng = random.Random(8)
    groups = {
        "a": [(x, 3 * x + 7 + rng.randrange(-2, 3)) for x in range(1, 14)],
        "b": [(x, -2 * x + rng.randrange(-1, 2)) for x in range(0, 12)],
        "c": [(x, rng.randrange(-50, 50)) for x in range(0, 9)],
    }
    rows = [(k, x, y) for k, pts in groups.items() for x, y in pts]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {
        r["k"]: (r["n_pairs"], r["slope"], r["intercept"])
        for r in theil_sen(df, "k", "x", "y").collect()
    }
    assert got == {k: _brute(sorted(pts)) for k, pts in groups.items()}


def test_outlier_robust(spark):
    """One wild outlier leaves the Theil-Sen slope at exactly 2 (the
    median pairwise slope is untouched) where OLS would be dragged."""
    pts = [(x, 2 * x) for x in range(11)]
    pts[5] = (5, 100000)
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "k string, x long, y long"
    )
    row = theil_sen(df, "k", "x", "y").collect()[0]
    assert row["slope"] == 2.0 and row["intercept"] == 0.0


def test_single_point_group_dropped(spark):
    df = spark.createDataFrame(
        [("solo", 1, 5), ("pair", 1, 1), ("pair", 2, 3)],
        "k string, x long, y long",
    )
    got = {r["k"]: r["slope"] for r in theil_sen(df, "k", "x", "y").collect()}
    assert got == {"pair": 2.0}
