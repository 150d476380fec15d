"""gini_coefficient / benford_audit (gini.py) vs closed forms and
Python mirrors."""

from __future__ import annotations

import math

from crgp_spark.operators.gini import _BENFORD, benford_audit, gini_coefficient


def _amounts(spark, rows):
    return spark.createDataFrame(
        [(g, int(x)) for g, x in rows], "g: string, x: long"
    )


def test_gini_uniform_is_zero(spark):
    rows = [("a", 7)] * 12
    r = gini_coefficient(_amounts(spark, rows)).collect()[0]
    assert r.gini == 0.0


def test_gini_single_holder(spark):
    n = 10
    rows = [("a", 0)] * (n - 1) + [("a", 1000)]
    r = gini_coefficient(_amounts(spark, rows)).collect()[0]
    want = math.floor((n - 1) / n * 1e6 + 0.5) / 1e6
    assert r.gini == want


def test_gini_brute_force_with_ties(spark):
    data = {
        "a": [(i * 13) % 7 + 1 for i in range(23)],
        "b": [5, 5, 5, 50],
    }
    rows = [(g, x) for g, xs in data.items() for x in xs]
    got = {r.g: r for r in gini_coefficient(_amounts(spark, rows)).collect()}
    for g, xs in data.items():
        xs = sorted(xs)
        n, tot = len(xs), sum(xs)
        s2 = sum((i + 1) * x for i, x in enumerate(xs))
        gini = (2 * s2 - (n + 1) * tot) / (n * tot)
        assert (got[g].n, got[g].total, got[g].s2) == (n, tot, s2)
        assert got[g].gini == math.floor(gini * 1e6 + 0.5) / 1e6


def test_benford_mirror(spark):
    vals = [int(math.exp(i / 5.0) * 100) for i in range(1, 60)]
    rows = [("a", v) for v in vals]
    got = benford_audit(_amounts(spark, rows)).collect()
    cnt = {d: 0 for d in range(1, 10)}
    for v in vals:
        if v > 0:
            cnt[int(str(v)[0])] += 1
    n = sum(cnt.values())
    acc = 0
    for d in range(1, 10):
        e = float(n) * _BENFORD[d]
        dv = float(cnt[d]) - e
        acc += math.floor(dv * dv / e * 1e8 + 0.5)
    chi2 = math.floor(float(acc) / 1e8 * 1e4 + 0.5) / 1e4
    assert len(got) == 9
    for r in got:
        assert r.n_obs == cnt[r.digit]
        e = float(n) * _BENFORD[r.digit]
        assert r.expected == math.floor(e * 1e4 + 0.5) / 1e4
        assert r.chi2 == chi2


def test_benford_excludes_nonpositive(spark):
    rows = [("a", 0), ("a", -5), ("a", 123)]
    got = benford_audit(_amounts(spark, rows)).collect()
    assert sum(r.n_obs for r in got) == 1
