"""Structural virality: hand-computed Wiener values on star vs chain
(the canonical broadcast-vs-viral pair from Goel et al. 2016), radius
truncation, and agreement with a brute-force all-pairs computation."""

from __future__ import annotations

import itertools

from crgp_spark.config import EngineConfig
from crgp_spark.operators.virality import structural_virality


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, conv_id string")


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4)


def test_star_vs_chain(spark):
    # star u1: center 100000, leaves 100001..100003 -> 6 pairs,
    # wiener = 3*1 + 3*2 = 9, mean 1.5
    # chain u2: 200000-200001-200002-200003 -> 6 pairs,
    # wiener = 3*1 + 2*2 + 1*3 = 10, mean 1.666667
    star = [(100000, 100000 + i, "u1") for i in (1, 2, 3)]
    chain = [(200000 + i, 200000 + i + 1, "u2") for i in range(3)]
    got = {
        r["conv_id"]: r.asDict()
        for r in structural_virality(
            spark, _edges(spark, star + chain), radius=3, cfg=_cfg()
        ).collect()
    }
    s, c = got["u1"], got["u2"]
    assert (s["n_vertices"], s["n_pairs"], s["wiener"], s["mean_dist"]) == (
        4, 6, 9, 1.5,
    )
    assert (c["n_vertices"], c["n_pairs"], c["wiener"], c["mean_dist"]) == (
        4, 6, 10, 1.666667,
    )
    assert c["mean_dist"] > s["mean_dist"]  # chain is more viral


def test_radius_truncation(spark):
    # 5-chain at radius 2: pairs at d<=2 only: 4x d1 + 3x d2 -> 7 pairs
    chain = [(300000 + i, 300000 + i + 1, "u3") for i in range(4)]
    row = structural_virality(
        spark, _edges(spark, chain), radius=2, cfg=_cfg()
    ).collect()[0]
    assert (row["n_vertices"], row["n_pairs"], row["wiener"]) == (5, 7, 10)


def test_matches_bruteforce_all_pairs(spark):
    # arbitrary small graph, radius large enough to cover the diameter
    edges = [(400000, 400001), (400000, 400002), (400001, 400003),
             (400002, 400003), (400003, 400004)]
    rows = [(a, b, "u4") for a, b in edges]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def dist(s, t):
        seen, frontier, d = {s}, {s}, 0
        while frontier:
            if t in frontier:
                return d
            frontier = {n for v in frontier for n in adj[v]} - seen
            seen |= frontier
            d += 1
        return None

    verts = sorted(adj)
    exp_pairs = exp_wiener = 0
    for a, b in itertools.combinations(verts, 2):
        d = dist(a, b)
        if d is not None and d <= 3:
            exp_pairs += 1
            exp_wiener += d
    row = structural_virality(
        spark, _edges(spark, rows), radius=3, cfg=_cfg()
    ).collect()[0]
    assert (row["n_pairs"], row["wiener"]) == (exp_pairs, exp_wiener)
    assert row["n_vertices"] == len(verts)
