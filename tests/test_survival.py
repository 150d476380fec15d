"""kaplan_meier (survival.py) vs a Python mirror and textbook cases."""

from __future__ import annotations

import math
from collections import defaultdict

from crgp_spark.operators.survival import kaplan_meier


def _lnq(x):
    return math.floor(math.log(x) * 1e6 + 0.5)


def _ref(subjects):
    by_t = defaultdict(lambda: [0, 0])
    for dur, ev in subjects:
        by_t[dur][0 if ev else 1] += 1
    n = len(subjects)
    out = {}
    lns = 0
    dead = False
    risk = n
    for t in sorted(by_t):
        d, c = by_t[t]
        if d > 0 and risk > d:
            lns += _lnq(risk - d) - _lnq(risk)
        if risk <= d:
            dead = True
        out[t] = (risk, d, c, None if dead else lns)
        risk -= d + c
    return out


def _df(spark, subjects):
    return spark.createDataFrame(
        [(int(d), int(e)) for d, e in subjects], "dur: long, ev: int"
    )


def test_km_textbook(spark):
    # classic: events at 1,2,4; censored at 3
    subjects = [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0), (5, 0)]
    got = {
        r.t: (r.n_risk, r.d_events, r.c_censored, r.lns_scaled)
        for r in kaplan_meier(_df(spark, subjects)).collect()
    }
    assert got == _ref(subjects)
    # S(1) = 5/6 exactly on the quantized log scale
    assert got[1][3] == _lnq(5) - _lnq(6)


def test_km_all_events_hits_zero(spark):
    subjects = [(1, 1), (2, 1), (2, 1)]
    got = {
        r.t: r.lns_scaled
        for r in kaplan_meier(_df(spark, subjects)).collect()
    }
    assert got[1] is not None
    assert got[2] is None  # risk set extinguished -> S = 0


def test_km_random_mirror(spark):
    subjects = [
        ((i * 7) % 11 + 1, 1 if (i * 5) % 3 else 0) for i in range(45)
    ]
    got = {
        r.t: (r.n_risk, r.d_events, r.c_censored, r.lns_scaled)
        for r in kaplan_meier(_df(spark, subjects)).collect()
    }
    assert got == _ref(subjects)
