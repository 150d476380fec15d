"""Maximal matching: validity (no shared endpoints), maximality after
enough rounds, determinism, and hand-checkable small shapes."""

from __future__ import annotations

import hashlib
import random

from crgp_spark.config import EngineConfig
from crgp_spark.operators.matching import maximal_matching


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4)


def _pri(u, v, r):
    return hashlib.md5(f"{u}:{v}:{r}".encode()).hexdigest()


def test_triangle_picks_single_min_edge(spark):
    got = maximal_matching(
        spark, _edges(spark, [(1, 2), (2, 3), (1, 3)]), rounds=4, cfg=_cfg()
    ).collect()
    assert len(got) == 1
    # in a triangle every edge is adjacent to every other: the winner
    # is the globally minimum round-1 priority
    want = min([(1, 2), (2, 3), (1, 3)], key=lambda e: _pri(*e, 1))
    assert (got[0]["u"], got[0]["v"]) == want and got[0]["rnd"] == 1


def test_star_matches_exactly_one_edge(spark):
    e = [(0, i) for i in range(1, 6)]
    got = maximal_matching(spark, _edges(spark, e), rounds=4, cfg=_cfg()).collect()
    assert len(got) == 1 and got[0]["u"] == 0


def test_valid_maximal_and_deterministic(spark):
    rng = random.Random(7)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(60)})
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, maximal_matching(spark, e, rounds=8, cfg=_cfg()).collect()))
    b = sorted(map(tuple, maximal_matching(spark, e, rounds=8, cfg=_cfg()).collect()))
    assert a == b  # deterministic

    # validity: no vertex appears twice
    seen = set()
    for u, v, _ in a:
        assert u not in seen and v not in seen
        seen.add(u)
        seen.add(v)

    # maximality: every input edge has a matched endpoint
    und = {(min(x, y), max(x, y)) for x, y in pairs}
    for u, v in und:
        assert u in seen or v in seen, (u, v)


def test_empty_graph(spark):
    got = maximal_matching(
        spark, _edges(spark, [(5, 5)]), rounds=2, cfg=_cfg()
    ).collect()
    assert got == []
