"""k-core peeling: exact fixpoint on known graphs, fixed-round replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from crgp_spark.operators.kcore import kcore


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_k4_with_tail(spark):
    """K4 (0-3) plus a pendant path 3-4-5: the 3-core is exactly the K4
    with in-core degree 3 everywhere."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = _edges(spark, k4 + [(3, 4), (4, 5)])
    got = sorted(tuple(r) for r in kcore(spark, e, k=3).collect())
    assert got == [(0, 3), (1, 3), (2, 3), (3, 3)]


def test_cascading_peel(spark):
    """A chain of corona vertices peels over multiple rounds: path
    0-1-2-3-4 has an empty 2-core; a 5-cycle IS its own 2-core."""
    path = [(i, i + 1) for i in range(4)]
    assert kcore(spark, _edges(spark, path), k=2).count() == 0
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    got = sorted(tuple(r) for r in kcore(spark, _edges(spark, cyc), k=2).collect())
    assert got == [(i, 2) for i in range(5)]


def test_fixed_rounds_reaches_fixpoint(spark):
    """On a graph whose peeling converges within R rounds, fixed_rounds=R
    equals the fixpoint; duplicate/reversed input edges are canonicalized."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    noisy = k4 + [(b, a) for a, b in k4] + [(3, 4), (4, 5), (4, 5)]
    e = _edges(spark, noisy)
    fix = sorted(tuple(r) for r in kcore(spark, e, k=3).collect())
    pinned = sorted(tuple(r) for r in kcore(spark, e, k=3, fixed_rounds=4).collect())
    assert fix == pinned == [(0, 3), (1, 3), (2, 3), (3, 3)]
