"""Kleinberg burst detection: python replication of the integer DP,
burst window sanity on a planted bursty segment, degenerate keys."""

from __future__ import annotations

from crgp_spark.operators.bursts import GAMMA, LN2, SCALE, burst_detect


def _brute(ts):
    t = sorted(ts)
    x = [b - a for a, b in zip(t, t[1:])]
    n = len(x)
    span = t[-1] - t[0] if t else 0
    if n < 1 or span <= 0:
        return (n, 0, 0)
    c0, c1, burst = 0, GAMMA, 0
    for g in x:
        cost0 = (g * n * SCALE) // span
        cost1 = (g * n * 2 * SCALE) // span - LN2
        n0 = min(c0, c1) + cost0
        n1 = min(c0 + GAMMA, c1) + cost1
        if n1 < n0:
            burst += 1
        c0, c1 = n0, n1
    return (n, burst, min(c0, c1))


def _run(spark, rows):
    df = spark.createDataFrame(rows, "uid long, t long")
    return {r["uid"]: (r["n_gaps"], r["burst_steps"], r["cost"])
            for r in burst_detect(df).collect()}


def test_planted_burst_is_found(spark):
    # base gaps of 100, a burst of ten 1-gaps in the middle
    ts, t = [], 0
    for g in [100] * 5 + [1] * 10 + [100] * 5:
        ts.append(t)
        t += g
    ts.append(t)
    got = _run(spark, [(7, x) for x in ts])
    assert got[7] == _brute(ts)
    # the burst segment dominates the filtered burst-state count
    assert got[7][1] >= 8


def test_uniform_sequence_never_bursts(spark):
    ts = list(range(0, 2000, 100))
    got = _run(spark, [(1, x) for x in ts])
    assert got[1] == _brute(ts)
    assert got[1][1] == 0


def test_degenerate_keys(spark):
    # one event (no gaps) and all-equal timestamps (span 0)
    got = _run(spark, [(1, 5), (2, 9), (2, 9), (2, 9)])
    assert got[1] == (0, 0, 0)
    assert got[2] == (2, 0, 0)


def test_randomized_parity(spark):
    import random
    rng = random.Random(3)
    rows = []
    want = {}
    for uid in range(5):
        ts = sorted(rng.sample(range(100000), 40))
        rows += [(uid, t) for t in ts]
        want[uid] = _brute(ts)
    assert _run(spark, rows) == want
