"""spearman_rho (rankcorr.py) and chi2_independence (experiment.py)
against Python mirrors."""

from __future__ import annotations

import math
from collections import Counter

from crgp_spark.operators.experiment import chi2_independence
from crgp_spark.operators.rankcorr import spearman_rho


def _r2(vals):
    cnt = Counter(vals)
    uniq = sorted(cnt)
    lt = {}
    run = 0
    for v in uniq:
        lt[v] = run
        run += cnt[v]
    return {v: 2 * lt[v] + cnt[v] + 1 for v in uniq}


def _ref_spearman(xy):
    xs = [x for x, _ in xy]
    ys = [y for _, y in xy]
    rx, ry = _r2(xs), _r2(ys)
    ax = [rx[x] for x in xs]
    ay = [ry[y] for y in ys]
    n = len(xy)
    sx, sy = sum(ax), sum(ay)
    sxx = sum(v * v for v in ax)
    syy = sum(v * v for v in ay)
    sxy = sum(a * b for a, b in zip(ax, ay))
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    rho = (
        float(num) / math.sqrt(float(denx) * float(deny))
        if denx > 0 and deny > 0
        else 0.0
    )
    return n, num, denx, deny, math.floor(rho * 1e6 + 0.5) / 1e6


def _pairs(spark, xy):
    return spark.createDataFrame(
        [(int(x), int(y)) for x, y in xy], "x: long, y: long"
    )


def test_spearman_perfect_monotone(spark):
    xy = [(i, i * i) for i in range(20)]
    r = spearman_rho(_pairs(spark, xy)).collect()[0]
    assert r.rho == 1.0


def test_spearman_reversed(spark):
    xy = [(i, 100 - i) for i in range(15)]
    r = spearman_rho(_pairs(spark, xy)).collect()[0]
    assert r.rho == -1.0


def test_spearman_ties_brute(spark):
    xy = [((i * 7) % 5, (i * 3) % 4) for i in range(57)]
    n, num, denx, deny, rho = _ref_spearman(xy)
    r = spearman_rho(_pairs(spark, xy)).collect()[0]
    assert (r.n, r.num, r.denx, r.deny) == (n, num, denx, deny)
    assert r.rho == rho


def test_chi2_mirror(spark):
    rows = [
        (u, ["a", "b", "c"][(u * 3 + i) % 3])
        for u in range(40)
        for i in range(1 + u % 3)
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    got = chi2_independence(df).collect()
    # Python mirror with the same (cat, arm) fold order
    cells = Counter((et, u % 2) for u, et in rows)
    rtot = Counter()
    ctot = Counter()
    for (et, a), c in cells.items():
        rtot[et] += c
        ctot[a] += c
    n = sum(cells.values())
    acc = 0
    for et, a in sorted(cells):
        e = float(rtot[et]) * float(ctot[a]) / float(n)
        d = float(cells[(et, a)]) - e
        acc += math.floor(d * d / e * 1e8 + 0.5)
    chi2 = math.floor(float(acc) / 1e8 * 1e4 + 0.5) / 1e4
    assert len(got) == len(cells)
    for r in got:
        assert r.n_obs == cells[(r.cat, r.arm)]
        assert r.chi2 == chi2
        assert r.dof == (len(rtot) - 1) * (len(ctot) - 1)


def test_chi2_independent_is_zero(spark):
    # identical distribution per arm -> chi2 == 0
    rows = [
        (u, et) for u in range(20) for et in ["a", "a", "b"]
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    got = chi2_independence(df).collect()
    assert all(r.chi2 == 0.0 for r in got)
