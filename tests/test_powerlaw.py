"""powerlaw_alpha (graphstats.py) vs a Python mirror."""

from __future__ import annotations

import math
from itertools import combinations

from crgp_spark.operators.graphstats import powerlaw_alpha


def _lnq(x):
    return math.floor(math.log(x) * 1e6 + 0.5)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src: long, dst: long"
    )


def _ref(pairs, d_min):
    deg = {}
    for a, b in {(min(p), max(p)) for p in pairs if p[0] != p[1]}:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tail = [d for d in deg.values() if d >= d_min]
    denom = sum(_lnq(d) - _lnq(d_min) for d in tail)
    alpha = 1.0 + len(tail) * 1e6 / denom if denom > 0 else 0.0
    return len(tail), denom, math.floor(alpha * 1e6 + 0.5) / 1e6


def test_star_mirror(spark):
    # star: hub deg 6, leaves deg 1 -> tail at d_min=2 is just the hub
    pairs = [(0, i) for i in range(1, 7)]
    n, denom, alpha = _ref(pairs, 2)
    r = powerlaw_alpha(_edges(spark, pairs), d_min=2).collect()[0]
    assert (r.n_tail, r.denom_scaled, r.alpha) == (n, denom, alpha)


def test_degenerate_tail_zero(spark):
    # triangle: all degrees == 2 == d_min -> denom 0 -> alpha 0.0
    pairs = [(0, 1), (1, 2), (0, 2)]
    r = powerlaw_alpha(_edges(spark, pairs), d_min=2).collect()[0]
    assert r.denom_scaled == 0 and r.alpha == 0.0 and r.n_tail == 3


def test_mixed_graph_mirror(spark):
    pairs = list(combinations(range(6), 2)) + [
        (5 + i, 5 + i + 1) for i in range(20)
    ]
    for dm in (1, 2, 3):
        n, denom, alpha = _ref(pairs, dm)
        r = powerlaw_alpha(_edges(spark, pairs), d_min=dm).collect()[0]
        assert (r.n_tail, r.denom_scaled, r.alpha) == (n, denom, alpha)
