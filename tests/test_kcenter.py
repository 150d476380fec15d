"""kcenter_assign: parity with a pure-Python Gonzalez brute force,
the 2-approx invariant (centers are farther apart than any point is
from its center), and the k-guard."""

from __future__ import annotations

import math
import random

import pytest

from crgp_spark.operators.kcenter import kcenter_assign

Q = 1_000_000


def _vecs(n=30, dim=4, seed=5):
    rng = random.Random(seed)
    return {
        i: [rng.uniform(-0.5, 0.5) for _ in range(dim)] for i in range(n)
    }


def _brute(vecs, k):
    q = {
        i: [math.floor(x * Q + 0.5) for x in v] for i, v in vecs.items()
    }

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(q[a], q[b]))

    c0 = min(q)
    centers = [c0]
    best = {i: d2(i, c0) for i in q}
    for _ in range(1, k):
        nxt = max(q, key=lambda i: (best[i], -i))
        centers.append(nxt)
        for i in q:
            best[i] = min(best[i], d2(i, nxt))
    out = {}
    for i in q:
        rk, dd = min(
            ((r, d2(i, c)) for r, c in enumerate(centers)),
            key=lambda t: (t[1], t[0]),
        )
        out[i] = (rk, centers[rk], dd)
    return centers, out


@pytest.mark.parametrize("k", [1, 3, 6])
def test_matches_bruteforce(spark, k):
    vecs = _vecs()
    df = spark.createDataFrame(
        sorted(vecs.items()), "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: (r["center_rank"], r["center_id"], r["d2"])
        for r in kcenter_assign(spark, df, k=k).collect()
    }
    _, want = _brute(vecs, k)
    assert got == want


def test_gonzalez_invariant(spark):
    """min pairwise center distance >= max point-to-center distance —
    the property that makes greedy selection a 2-approximation, and a
    direct check that the picked set is diverse."""
    vecs = _vecs(n=40, seed=9)
    df = spark.createDataFrame(
        sorted(vecs.items()), "vec_id long, embedding array<float>"
    )
    rows = kcenter_assign(spark, df, k=5).collect()
    centers, _ = _brute(vecs, 5)
    q = {
        i: [math.floor(x * Q + 0.5) for x in v] for i, v in vecs.items()
    }
    min_cc = min(
        sum((x - y) ** 2 for x, y in zip(q[a], q[b]))
        for a in centers
        for b in centers
        if a < b
    )
    max_pc = max(r["d2"] for r in rows)
    assert min_cc >= max_pc
    assert {r["center_id"] for r in rows} == set(centers)


def test_k_exceeds_points_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="exceeds"):
        kcenter_assign(spark, df, k=3)
