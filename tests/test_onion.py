"""onion_decomposition (coreness.py) vs a Python peel mirror, plus the
core-number cross-check against core_decomposition."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from crgp_spark.operators.coreness import (
    core_decomposition,
    onion_decomposition,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src: long, dst: long"
    )


def _ref(pairs, rounds):
    nb = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nb[a].add(b)
            nb[b].add(a)
    active = set(nb)
    k = 0
    out = {}
    for r in range(1, rounds + 1):
        if not active:
            break
        deg = {v: len(nb[v] & active) for v in active}
        k = max(k, min(deg.values()))
        layer = {v for v in active if deg[v] <= k}
        for v in layer:
            out[v] = (r, k)
        active -= layer
    for v in active:
        out[v] = (0, 0)
    return out


def _run(spark, pairs, rounds):
    res = onion_decomposition(spark, _edges(spark, pairs), rounds=rounds)
    return {r.vid: (r.layer, r.core) for r in res.collect()}


def test_star_plus_triangle(spark):
    # leaves peel in layer 1 at k=1, then the center; triangle peels at k=2
    pairs = [(0, i) for i in range(1, 5)] + [(10, 11), (11, 12), (10, 12)]
    got = _run(spark, pairs, rounds=4)
    assert got == _ref(pairs, 4)
    assert got[1] == (1, 1) and got[10][1] == 2  # triangle core 2


def test_path_partial_peel(spark):
    pairs = [(i, i + 1) for i in range(9)]  # P10: ends peel inward
    got = _run(spark, pairs, rounds=3)
    assert got == _ref(pairs, 3)
    assert any(v == (0, 0) for v in got.values())  # middle still open


def test_random_matches_ref_and_coreness(spark):
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                ((i * 29) % 19, (i * 7 + 2) % 19) for i in range(50)
            )
            if a != b
        }
    ) + list(combinations(range(30, 34), 2))  # plus a K4
    got = _run(spark, pairs, rounds=8)
    assert got == _ref(pairs, 8)
    core = {
        r.vid: r.core
        for r in core_decomposition(spark, _edges(spark, pairs)).collect()
    }
    for v, (layer, k) in got.items():
        if layer > 0:
            assert core[v] == k, (v, layer, k, core[v])
