"""Count-min sketch: python cross-check, monoid merge, guarantees."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.cms import (
    cms_estimate,
    cms_merge,
    cms_sketch,
    heavy_hitters,
)


def _h(r: int, key, width: int) -> int:
    hx = hashlib.md5(f"{r}:{key}".encode()).hexdigest()[:15]
    return int(hx, 16) % width


def _py_grid(keys, depth, width):
    grid: dict[tuple[int, int], int] = {}
    for k in keys:
        for r in range(depth):
            cell = (r, _h(r, k, width))
            grid[cell] = grid.get(cell, 0) + 1
    return grid


def test_grid_matches_python(spark):
    keys = [i % 7 for i in range(100)] + [3] * 50
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(df, "k", depth=3, width=8).collect()
    }
    assert got == _py_grid(keys, 3, 8)


def test_estimate_overestimates_and_is_exact_without_collisions(spark):
    keys = [i % 5 for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    # wide grid: 5 keys in 4096 buckets -> no collisions, est == exact
    sk = cms_sketch(df, "k", depth=4, width=4096)
    probes = df.select("k").distinct()
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sk, probes, "k", depth=4, width=4096).collect()
    }
    assert est == {k: 40 for k in range(5)}
    # tiny grid: collisions certain, estimate may only go UP
    sk2 = cms_sketch(df, "k", depth=2, width=2)
    est2 = cms_estimate(sk2, probes, "k", depth=2, width=2).collect()
    assert all(r["est"] >= 40 for r in est2)


def test_merge_is_the_monoid(spark):
    a = spark.createDataFrame([(i % 11,) for i in range(150)], "k long")
    b = spark.createDataFrame([(i % 7,) for i in range(90)], "k long")
    merged = cms_merge(
        cms_sketch(a, "k", depth=3, width=16),
        cms_sketch(b, "k", depth=3, width=16),
    )
    whole = cms_sketch(a.unionByName(b), "k", depth=3, width=16)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_heavy_hitters_ranking_and_guarantee(spark):
    rows = [(k,) for k in [1] * 30 + [2] * 20 + [3] * 10 + list(range(4, 24))]
    df = spark.createDataFrame(rows, "k long")
    out = heavy_hitters(df, "k", k=3, depth=4, width=64).collect()
    assert [(r["k"], r["exact"]) for r in sorted(out, key=lambda r: -r["exact"])] == [
        (1, 30),
        (2, 20),
        (3, 10),
    ]
    assert all(r["over_ok"] for r in out)


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        cms_sketch(df, "k", depth=0)
