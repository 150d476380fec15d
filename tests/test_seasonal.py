"""seasonal_decompose: parity with a pure-Python classical
decomposition, gap -> NULL trend, perfect-seasonal recovery."""

from __future__ import annotations

import random

import pytest

from crgp_spark.operators.timeseries import seasonal_decompose


def _brute(rows, period):
    half = period // 2
    t = {}
    for k, d, x in rows:
        win = [x2 for k2, d2, x2 in rows if k2 == k and abs(d2 - d) <= half]
        t[(k, d)] = sum(win) if len(win) == period else None
    sn, m = {}, {}
    for k, d, x in rows:
        if t[(k, d)] is None:
            continue
        p = (k, d % period)
        sn[p] = sn.get(p, 0) + period * x - t[(k, d)]
        m[p] = m.get(p, 0) + 1
    out = {}
    for k, d, x in rows:
        tt = t[(k, d)]
        if tt is None:
            out[(k, d)] = (x, None, None, None)
            continue
        p = (k, d % period)
        seas = sn[p] / (period * m[p])
        out[(k, d)] = (
            x,
            tt / period,
            seas,
            (period * x - tt) / period - seas,
        )
    return out


def _series(seed=4):
    rng = random.Random(seed)
    rows = []
    for k in ("a", "b"):
        for d in range(100, 130):
            if k == "b" and d == 115:
                continue  # a hole: the 7 windows crossing it lose trend
            rows.append((k, d, 50 + 10 * (d % 7) + rng.randrange(-3, 4)))
    return rows


def test_matches_bruteforce(spark):
    rows = _series()
    df = spark.createDataFrame(rows, "k string, day long, x long")
    got = {
        (r["k"], r["day"]): (r["x"], r["trend"], r["seasonal"], r["residual"])
        for r in seasonal_decompose(df, ["k"], "day", "x", period=7).collect()
    }
    assert got == _brute(rows, 7)


def test_gap_nulls_trend(spark):
    rows = _series()
    df = spark.createDataFrame(rows, "k string, day long, x long")
    got = {
        (r["k"], r["day"]): r["trend"]
        for r in seasonal_decompose(df, ["k"], "day", "x", period=7).collect()
    }
    # edges (first/last 3 days) and the 6 days straddling b's hole
    assert got[("b", 114)] is None and got[("b", 116)] is None
    assert got[("a", 100)] is None and got[("a", 115)] is not None


def test_pure_seasonal_recovered_exactly(spark):
    """x = 700 + phase pattern (zero-mean over each window) must give
    integer-exact trend 700·period/period = 700 and residual 0."""
    pattern = [21, -14, 7, 0, -7, 14, -21]  # sums to 0 over any 7 days
    rows = [("k", d, 700 + pattern[d % 7]) for d in range(50)]
    df = spark.createDataFrame(rows, "k string, day long, x long")
    for r in seasonal_decompose(df, ["k"], "day", "x", period=7).collect():
        if r["trend"] is not None:
            assert r["trend"] == 700.0
            assert r["seasonal"] == float(pattern[r["day"] % 7])
            assert r["residual"] == 0.0


def test_even_period_rejected(spark):
    df = spark.createDataFrame([("k", 1, 1)], "k string, day long, x long")
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose(df, ["k"], "day", "x", period=6)
