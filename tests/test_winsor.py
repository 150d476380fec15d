"""winsorized_stats: brute-force parity, outlier clamping, tail-count
convention (k = n*pct // 100), degenerate trims."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from crgp_spark.operators.robust import winsorized_stats


def _brute(vals, pct):
    vs = sorted(vals)
    n = len(vs)
    k = n * pct // 100
    lo, hi = vs[k], vs[n - k - 1]
    clamped = [min(max(v, lo), hi) for v in vals]
    s = sum(clamped)
    return (n, lo, hi, s, s / n)


def test_matches_bruteforce(spark):
    rng = random.Random(6)
    groups = {
        "a": [rng.randrange(-1000, 1000) for _ in range(137)],
        "b": [rng.randrange(0, 50) for _ in range(19)],
        "c": [7],  # k = 0: lo == hi == 7, wmean == 7
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r["k"]: (r["n"], r["lo"], r["hi"], r["wsum"], r["wmean"])
        for r in winsorized_stats(df, "k", F.col("v"), 5).collect()
    }
    assert got == {g: _brute(vs, 5) for g, vs in groups.items()}


def test_outlier_clamped(spark):
    """100 sane values + one 10^9 outlier: the winsorized mean stays
    within the sane range while the plain mean explodes."""
    vals = list(range(100)) + [10**9]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v long")
    row = winsorized_stats(df, "k", F.col("v"), 5).collect()[0]
    assert row["hi"] < 100 and 0 <= row["wmean"] <= 100
    assert sum(vals) / len(vals) > 10**6  # what the naive mean does


def test_bad_pct_raises(spark):
    df = spark.createDataFrame([("g", 1)], "k string, v long")
    with pytest.raises(ValueError, match="trim_pct"):
        winsorized_stats(df, "k", F.col("v"), 50)
