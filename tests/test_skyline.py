"""2-D skyline operator (crgp_spark/operators/skyline.py).

Checked against a brute-force python dominance filter on several
shapes: random points, total-order chains (frontier = 1 point),
anti-chains (frontier = everything), duplicates, and y-ties across x
(the later-x tie must be dominated).
"""

from __future__ import annotations

import hashlib

from crgp_spark.operators.skyline import skyline2d


def _brute(points):
    cnt = {}
    for p in points:
        cnt[p] = cnt.get(p, 0) + 1
    keep = []
    for p in cnt:
        dominated = any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in cnt
        )
        if not dominated:
            keep.append((p[0], p[1], cnt[p]))
    return sorted(keep)


def _run(spark, points, partitions=4):
    df = spark.createDataFrame(points, "x: long, y: long")
    got = sorted(
        (r["x"], r["y"], r["n"])
        for r in skyline2d(df, "x", "y", partitions=partitions).collect()
    )
    assert got == _brute(points)
    return got


def _hpoints(n, mod, salt):
    out = []
    for i in range(n):
        h = hashlib.md5(f"{salt}:{i}".encode()).digest()
        out.append((h[0] % mod, h[1] % mod))
    return out


def test_random_points_match_bruteforce(spark):
    _run(spark, _hpoints(400, 40, "a"))


def test_chain_has_single_frontier_point(spark):
    got = _run(spark, [(i, i) for i in range(50)], partitions=8)
    assert got == [(0, 0, 1)]


def test_antichain_keeps_everything(spark):
    got = _run(spark, [(i, 49 - i) for i in range(50)], partitions=8)
    assert len(got) == 50


def test_duplicates_counted(spark):
    got = _run(spark, [(1, 1), (1, 1), (2, 0), (0, 2), (2, 2)])
    assert got == [(0, 2, 1), (1, 1, 2), (2, 0, 1)]


def test_y_tie_at_larger_x_is_dominated(spark):
    # (5, 3) ties y with (2, 3) but has larger x -> dominated
    got = _run(spark, [(2, 3), (5, 3), (1, 9)])
    assert got == [(1, 9, 1), (2, 3, 1)]


def test_more_partitions_than_rows(spark):
    _run(spark, [(3, 4), (4, 3)], partitions=16)
