from __future__ import annotations

import datetime as dt
import math

import pytest

from crgp_spark.operators.experiment import cuped_summary

_T0 = dt.datetime(2024, 1, 1)  # epoch day 19723
_SPLIT = 19725


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (u, _T0 + dt.timedelta(days=d, minutes=i), float(v))
            for i, (u, d, v) in enumerate(rows)
        ],
        "user_id: long, ts: timestamp_ntz, value: double",
    )


def _ref(rows, n_arms=2):
    """Python mirror: integer cents, same formula order."""
    per = {}
    for u, d, v in rows:
        c = math.floor(v * 100 + 0.5)
        x, y = per.get(u, (0, 0))
        if 19723 + d < _SPLIT:
            per[u] = (x + c, y)
        else:
            per[u] = (x, y + c)
    n = len(per)
    sx = sum(x for x, _ in per.values())
    sy = sum(y for _, y in per.values())
    sxy = sum(x * y for x, y in per.values())
    sxx = sum(x * x for x, _ in per.values())
    den = n * sxx - sx * sx
    theta = float(n * sxy - sx * sy) / float(den) if den else 0.0
    mean_x = float(sx) / float(n)
    out = {}
    for arm in range(n_arms):
        us = [(u, xy) for u, xy in per.items() if u % n_arms == arm]
        na = len(us)
        sxa = sum(x for _, (x, _) in us)
        sya = sum(y for _, (_, y) in us)
        mp = float(sya) / (100.0 * na)
        ma = (float(sya) - theta * (float(sxa) - na * mean_x)) / (100.0 * na)
        r4 = lambda z: math.floor(z * 10000.0 + 0.5) / 10000.0  # noqa: E731
        out[arm] = (na, r4(mp), r4(ma), r4(theta))
    return out


def test_matches_python_reference(spark):
    import random

    rng = random.Random(5)
    rows = [
        (u, rng.randrange(0, 6), rng.uniform(1, 50))
        for u in range(10)
        for _ in range(8)
    ]
    got = {
        r["arm"]: (r["n_users"], r["mean_post"], r["mean_adj"], r["theta"])
        for r in cuped_summary(_events(spark, rows), _SPLIT).collect()
    }
    assert got == _ref(rows)


def test_variance_reduction_preserves_overall_mean_direction(spark):
    # covariate perfectly predicts post: adjusted means converge
    rows = []
    for u in range(8):
        base = 10 + u  # user-level effect in BOTH periods
        rows += [(u, 0, float(base)), (u, 4, float(base))]
    got = {
        r["arm"]: r for r in cuped_summary(_events(spark, rows), _SPLIT).collect()
    }
    # raw post means differ between arms; adjusted means are closer
    raw_gap = abs(got[0]["mean_post"] - got[1]["mean_post"])
    adj_gap = abs(got[0]["mean_adj"] - got[1]["mean_adj"])
    assert adj_gap <= raw_gap + 1e-9


def test_validation(spark):
    with pytest.raises(ValueError):
        cuped_summary(_events(spark, [(1, 0, 1.0)]), _SPLIT, n_arms=1)


def test_srm_check(spark):
    from crgp_spark.operators.experiment import srm_check

    # 12 even users, 4 odd users: blatant SRM
    rows = [(2 * u, 0, 1.0) for u in range(12)] + [
        (2 * u + 1, 0, 1.0) for u in range(4)
    ]
    got = {
        r["arm"]: r for r in srm_check(_events(spark, rows)).collect()
    }
    assert got[0]["n_units"] == 12 and got[1]["n_units"] == 4
    assert got[0]["n_total"] == 16
    assert got[0]["expected"] == 8.0
    # chi2 = (12-8)^2/8 + (4-8)^2/8 = 4.0, identical on both rows
    assert got[0]["chi2"] == got[1]["chi2"] == 4.0


def test_srm_balanced_near_zero(spark):
    from crgp_spark.operators.experiment import srm_check

    rows = [(u, 0, 1.0) for u in range(40)]
    got = srm_check(_events(spark, rows)).collect()
    assert all(r["chi2"] == 0.0 for r in got)


def test_srm_validation(spark):
    from crgp_spark.operators.experiment import srm_check

    with pytest.raises(ValueError):
        srm_check(_events(spark, [(1, 0, 1.0)]), n_arms=1)
