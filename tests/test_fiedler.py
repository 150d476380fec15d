"""fiedler_vector (fiedler.py): exact-integer mirror + spectral
bisection sanity on graphs with known sparsest cuts."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from crgp_spark.operators.fiedler import fiedler_vector

SCALE = 1_000_000


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src: long, dst: long"
    )


def _h60(v):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _tdiv(a, b):
    return -((-a) // b) if a < 0 else a // b


def _ref(pairs, rounds, scale=SCALE):
    nb = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nb[a].add(b)
            nb[b].add(a)
    verts = sorted(nb)
    n = len(verts)
    deg = {v: len(nb[v]) for v in verts}
    sig = 2 * max(deg.values())
    h = {v: _h60(v) % scale for v in verts}
    mean0 = sum(h.values()) // n
    x = {v: h[v] - mean0 for v in verts}
    for _ in range(rounds):
        y = {
            v: (sig - deg[v]) * x[v] + sum(x[u] for u in nb[v])
            for v in verts
        }
        mean = _tdiv(sum(y.values()), n)
        z = {v: y[v] - mean for v in verts}
        m = max(abs(zv) for zv in z.values())
        x = {
            v: (0 if m == 0 else _tdiv(z[v] * scale, m)) for v in verts
        }
    return x


def test_integer_mirror_exact(spark):
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                ((i * 19) % 17, (i * 3 + 1) % 17) for i in range(40)
            )
            if a != b
        }
    )
    got = {
        r.vid: r.f_scaled
        for r in fiedler_vector(spark, _edges(spark, pairs), rounds=4)
        .collect()
    }
    assert got == _ref(pairs, rounds=4)


def test_barbell_bisection(spark):
    # two K4s joined by one edge: the sparsest cut is the bridge
    from itertools import combinations

    pairs = (
        list(combinations(range(4), 2))
        + [(a + 4, b + 4) for a, b in combinations(range(4), 2)]
        + [(0, 4)]
    )
    res = fiedler_vector(spark, _edges(spark, pairs), rounds=30)
    side = {r.vid: r.side for r in res.collect()}
    left = {side[v] for v in range(4)}
    right = {side[v] for v in range(4, 8)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_path_split_in_middle(spark):
    pairs = [(i, i + 1) for i in range(7)]  # P8
    res = fiedler_vector(spark, _edges(spark, pairs), rounds=40)
    side = {r.vid: r.side for r in res.collect()}
    assert {side[v] for v in range(4)} != {side[v] for v in range(4, 8)}
    assert len({side[v] for v in range(4)}) == 1
    assert len({side[v] for v in range(4, 8)}) == 1
