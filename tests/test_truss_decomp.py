"""Truss decomposition: hand-computed ladder on K5 + triangle + bridge
(converged schedule = true trussness there), bucket partitioning."""

from __future__ import annotations

import itertools

from crgp_spark.config import EngineConfig
from crgp_spark.operators.ktruss import truss_decomposition


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_td")


def test_k5_triangle_bridge_ladder(spark):
    # K5 on 0-4 (every edge in 3 triangles -> trussness 5), a triangle
    # 10-11-12 (trussness 3), bridge 4-10 (no triangle -> 2)
    edges = list(itertools.combinations(range(5), 2))
    edges += [(10, 11), (10, 12), (11, 12), (4, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["u"], r["v"]): r["trussness"]
           for r in truss_decomposition(spark, e, k_max=5, rounds_per_k=3,
                                        cfg=_cfg()).collect()}
    assert len(got) == len(edges)
    assert got[(4, 10)] == 2
    for t in [(10, 11), (10, 12), (11, 12)]:
        assert got[t] == 3
    for t in itertools.combinations(range(5), 2):
        assert got[t] == 5


def test_buckets_partition_edge_set(spark):
    edges = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (1, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    out = truss_decomposition(spark, e, k_max=4, rounds_per_k=2,
                              cfg=_cfg()).collect()
    # every undirected edge appears exactly once, with 2<=t<=4
    keys = [(r["u"], r["v"]) for r in out]
    assert len(keys) == len(set(keys)) == len(edges)
    assert all(2 <= r["trussness"] <= 4 for r in out)
