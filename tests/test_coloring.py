"""Jones–Plassmann coloring: python cross-check + propriety invariants."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from crgp_spark.operators.coloring import greedy_coloring


def _py_jp(edges, rounds):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    pri = {
        v: hashlib.md5(str(v).encode()).hexdigest() + ":" + str(v).zfill(20)
        for v in adj
    }
    active = set(adj)
    color: dict[int, int] = {}
    out = {}
    for r in range(1, rounds + 1):
        cand = [
            v
            for v in active
            if all(pri[v] < pri[u] for u in adj[v] if u in active)
        ]
        for v in cand:  # candidates are independent: order immaterial
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
            out[v] = (c, r)
        active -= set(cand)
    for v in active:
        out[v] = (-1, 0)
    return out


def _run(spark, edges, rounds=4):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["vid"]: (r["color"], r["rnd"])
        for r in greedy_coloring(spark, df, rounds=rounds).collect()
    }


def test_triangle_needs_three_colors(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 1)], rounds=4)
    colors = {v: c for v, (c, _) in got.items()}
    assert sorted(colors.values()) == [0, 1, 2]


def test_star_is_two_colors_and_hub_sets_are_round_bounded(spark):
    edges = [(0, i) for i in range(1, 30)]
    got = _run(spark, edges, rounds=4)
    hub = got[0][0]
    leaves = {got[i][0] for i in range(1, 30)}
    assert hub != -1 and -1 not in leaves
    assert leaves.isdisjoint({hub}) and len(leaves) == 1


def test_matches_python_reference_on_random_graph(spark):
    import random

    rng = random.Random(5)
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})
    got = _run(spark, edges, rounds=4)
    assert got == _py_jp(edges, 4)


def test_propriety_and_open_reporting(spark):
    # a long path: strictly-decreasing priority chains may survive
    # 2 rounds -> 'open' vertices allowed, but no colored edge clashes
    edges = [(i, i + 1) for i in range(60)]
    got = _run(spark, edges, rounds=2)
    assert got == _py_jp(edges, 2)
    for u, v in edges:
        cu, cv = got[u][0], got[v][0]
        if cu != -1 and cv != -1:
            assert cu != cv
    # rounds high enough: everything colored, path is 2-colorable-ish
    # (greedy may use 3) and nothing stays open
    full = _run(spark, edges, rounds=12)
    assert all(c != -1 for c, _ in full.values())
    assert max(c for c, _ in full.values()) <= 2
