"""scan_statistic (graphstats.py) and four_cliques (triangles.py):
closed-form K5/barbell cases plus an itertools brute force."""

from __future__ import annotations

from itertools import combinations

from crgp_spark.operators.graphstats import scan_statistic
from crgp_spark.operators.triangles import four_cliques


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src: long, dst: long"
    )


def _k(n, offset=0):
    return [(a + offset, b + offset) for a, b in combinations(range(n), 2)]


def test_k5_closed_form(spark):
    e = _edges(spark, _k(5))
    total, pv = four_cliques(spark, e)
    assert total == 5  # C(5,4)
    rows = {r.vid: r.k4 for r in pv.collect()}
    assert rows == {v: 4 for v in range(5)}  # each vertex in C(4,3)
    scan = {r.vid: (r.deg, r.triangles, r.scan1)
            for r in scan_statistic(spark, e).collect()}
    assert scan == {v: (4, 6, 10) for v in range(5)}


def test_barbell_and_path(spark):
    # two K4s joined by a path 3-100-101-4; path adds no cliques
    pairs = _k(4) + _k(4, offset=4) + [(3, 100), (100, 101), (101, 4)]
    total, pv = four_cliques(spark, _edges(spark, pairs))
    assert total == 2
    rows = {r.vid: r.k4 for r in pv.collect()}
    assert sum(rows.values()) == 8
    assert rows[100] == 0 and rows[101] == 0
    scan = {r.vid: r.scan1
            for r in scan_statistic(spark, _edges(spark, pairs)).collect()}
    # ego-net of vertex 100: edges (100,3),(100,101) -> deg 2, tri 0
    assert scan[100] == 2
    # vertex 0 in a K4: deg 3, tri 3 -> 6 (all K4 edges)
    assert scan[0] == 6


def test_brute_force(spark):
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                ((i * 7) % 13, (i * 11 + 3) % 13) for i in range(60)
            )
            if a != b
        }
    )
    es = set(pairs)
    verts = sorted({v for p in pairs for v in p})
    ref_total = 0
    ref_pv = {v: 0 for v in verts}
    for quad in combinations(verts, 4):
        if all(
            (min(x, y), max(x, y)) in es for x, y in combinations(quad, 2)
        ):
            ref_total += 1
            for v in quad:
                ref_pv[v] += 1
    total, pv = four_cliques(spark, _edges(spark, pairs))
    assert total == ref_total
    assert {r.vid: r.k4 for r in pv.collect()} == ref_pv
    # scan1 brute force: deg + triangles
    ref_scan = {}
    for v in verts:
        nb = {b for a, b in pairs if a == v} | {a for a, b in pairs if b == v}
        inner = sum(
            1 for x, y in combinations(sorted(nb), 2) if (x, y) in es
        )
        ref_scan[v] = len(nb) + inner
    scan = {r.vid: r.scan1
            for r in scan_statistic(spark, _edges(spark, pairs)).collect()}
    assert scan == ref_scan
