"""Borůvka minimum spanning forest (crgp_spark/operators/msf.py),
checked edge-for-edge against a python Kruskal under the same
(w, u, v) total order — with distinct ordering keys the MSF is unique,
so the two algorithms must agree exactly.
"""

from __future__ import annotations

import hashlib

import pytest

from crgp_spark.config import EngineConfig
from crgp_spark.operators.msf import minimum_spanning_forest


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4)


def _kruskal(edges):
    canon = {}
    for a, b, w in edges:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        canon[(u, v)] = min(canon.get((u, v), w), w)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    out = []
    for w, u, v in sorted((w, u, v) for (u, v), w in canon.items()):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src: long, dst: long, w: long")
    got = sorted(
        (r["u"], r["v"], r["w"])
        for r in minimum_spanning_forest(spark, df, cfg=_cfg()).collect()
    )
    assert got == _kruskal(edges)
    return got


def test_random_multigraph_matches_kruskal(spark):
    edges = []
    for i in range(120):
        h = hashlib.md5(f"m:{i}".encode()).digest()
        edges.append((h[0] % 20, h[1] % 20, h[2] % 8))  # dups + self-loops
    _run(spark, edges)


def test_two_components(spark):
    edges = [(1, 2, 5), (2, 3, 1), (1, 3, 2), (10, 11, 7), (11, 12, 7),
             (10, 12, 7)]
    got = _run(spark, edges)
    assert len(got) == 4  # 2 trees: 2 + 2 edges


def test_all_equal_weights_tiebreak(spark):
    # K4 with equal weights: unique MSF under (w, u, v) order =
    # the three lexicographically smallest edges
    edges = [(a, b, 3) for a in range(4) for b in range(a + 1, 4)]
    assert _run(spark, edges) == [(0, 1, 3), (0, 2, 3), (0, 3, 3)]


def test_long_chain_exercises_pointer_doubling(spark):
    # increasing-weight path: every round chains the pointer graph
    edges = [(i, i + 1, i + 1) for i in range(60)]
    got = _run(spark, edges)
    assert len(got) == 60  # a path IS its own spanning tree


def test_cycle_drops_heaviest_edge(spark):
    edges = [(1, 2, 1), (2, 3, 2), (3, 1, 9)]
    assert _run(spark, edges) == [(1, 2, 1), (2, 3, 2)]


def test_negative_weight_raises(spark):
    df = spark.createDataFrame([(1, 2, -1)], "src: long, dst: long, w: long")
    with pytest.raises(ValueError, match="non-negative"):
        minimum_spanning_forest(spark, df, cfg=_cfg())


def test_null_weight_raises(spark):
    df = spark.createDataFrame(
        [(1, 2, None)], "src: long, dst: long, w: long"
    )
    with pytest.raises(ValueError, match="non-NULL|non-negative"):
        minimum_spanning_forest(spark, df, cfg=_cfg())
