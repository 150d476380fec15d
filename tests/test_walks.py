"""Hash-walks: python-simulation cross-check, dangling stop, determinism."""

from __future__ import annotations

import hashlib

from crgp_spark.config import EngineConfig
from crgp_spark.operators.walks import hash_walks


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_walks")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _simulate(edges, steps):
    adj: dict[int, list[int]] = {}
    for s, d in set(edges):
        adj.setdefault(s, []).append(d)
    rows = []
    for start in sorted(adj):
        cur = start
        rows.append((start, 0, start))
        for t in range(1, steps + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(nbrs, key=lambda d: _md5(f"{cur}:{d}:{t}"))
            rows.append((start, t, cur))
    return sorted(rows)


def test_walks_match_python_simulation(spark):
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 0), (3, 4), (5, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r["walk_id"], r["step"], r["vid"])
        for r in hash_walks(spark, df, steps=5, cfg=_cfg()).collect()
    )
    assert got == _simulate(edges, 5)


def test_walks_stop_at_dangling(spark):
    # 0 -> 1 -> 2, and 2 has no out-edges: the walk from 0 has 3 rows
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    rows = hash_walks(spark, df, steps=10, cfg=_cfg()).collect()
    w0 = sorted((r["step"], r["vid"]) for r in rows if r["walk_id"] == 0)
    assert w0 == [(0, 0), (1, 1), (2, 2)]


def test_walks_duplicate_edges_ignored(spark):
    dup = [(0, 1)] * 3 + [(0, 2), (1, 0)]
    uniq = [(0, 1), (0, 2), (1, 0)]
    a = sorted(map(tuple, hash_walks(
        spark, spark.createDataFrame(dup, "src long, dst long"),
        steps=3, cfg=_cfg()).collect()))
    b = sorted(map(tuple, hash_walks(
        spark, spark.createDataFrame(uniq, "src long, dst long"),
        steps=3, cfg=_cfg()).collect()))
    assert a == b
