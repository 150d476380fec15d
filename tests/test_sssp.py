"""Bounded Bellman-Ford: cheaper multi-hop beats direct edge, round
cap semantics, multi-source min, and self-distance zero."""

from __future__ import annotations

from crgp_spark.config import EngineConfig
from crgp_spark.operators.sssp import bounded_sssp


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def _src(spark, vids):
    return spark.createDataFrame([(v,) for v in vids], "vid long")


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4)


def test_two_hop_beats_direct(spark):
    e = _edges(spark, [(1, 2, 5), (1, 3, 1), (3, 2, 1)])
    got = {
        r["vid"]: r["dist"]
        for r in bounded_sssp(spark, e, _src(spark, [1]), rounds=4, cfg=_cfg()).collect()
    }
    assert got == {1: 0, 2: 2, 3: 1}


def test_round_cap_limits_path_length(spark):
    # chain 1 -> 2 -> 3 -> 4 (w=1 each): rounds=2 cannot reach 4
    e = _edges(spark, [(1, 2, 1), (2, 3, 1), (3, 4, 1)])
    got = {
        r["vid"]: r["dist"]
        for r in bounded_sssp(spark, e, _src(spark, [1]), rounds=2, cfg=_cfg()).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}
    got4 = {
        r["vid"]: r["dist"]
        for r in bounded_sssp(spark, e, _src(spark, [1]), rounds=3, cfg=_cfg()).collect()
    }
    assert got4[4] == 3


def test_multi_source_takes_min(spark):
    # sources 1 and 10; vertex 5 reachable from both at different cost
    e = _edges(spark, [(1, 5, 7), (10, 5, 2)])
    got = {
        r["vid"]: r["dist"]
        for r in bounded_sssp(
            spark, e, _src(spark, [1, 10]), rounds=2, cfg=_cfg()
        ).collect()
    }
    assert got == {1: 0, 10: 0, 5: 2}


def test_revisit_improves_distance_across_rounds(spark):
    # round 1 reaches 3 via the heavy edge (w=9); round 2 finds the
    # lighter 2-hop path (w=1+1): the MIN re-aggregation must keep 2
    e = _edges(spark, [(1, 3, 9), (1, 2, 1), (2, 3, 1)])
    got = {
        r["vid"]: r["dist"]
        for r in bounded_sssp(spark, e, _src(spark, [1]), rounds=4, cfg=_cfg()).collect()
    }
    assert got[3] == 2
