"""ANF (FM bitmask propagation): python-simulation cross-check on a
fixed directed fixture, plus monotonicity/sanity properties."""

from __future__ import annotations

import hashlib

from crgp_spark.config import EngineConfig
from crgp_spark.operators.anf import anf, anf_vertices, nf_estimate

REG, MAXBIT = 4, 20


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_anf")


def _seed(v: int, j: int) -> int:
    h = int(hashlib.md5(f"{v}:{j}".encode()).hexdigest()[:15], 16)
    k = 0
    while k < MAXBIT and not (h >> k) & 1:
        k += 1
    return 1 << k  # k == MAXBIT also covers h == 0


def _lub(m: int) -> int:
    k = 0
    while (m >> k) & 1:
        k += 1
    return k


def _reach(edges, hops):
    """reach[h][v] = set reachable from v in <= h hops (incl. v)."""
    adj: dict[int, set[int]] = {}
    verts = set()
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            verts |= {s, d}
    reach = {0: {v: {v} for v in verts}}
    for h in range(1, hops + 1):
        reach[h] = {
            v: set(r).union(*(reach[h - 1][u] for u in adj.get(v, ())))
            for v, r in reach[h - 1].items()
        }
    return reach


def _bsum(vset) -> int:
    total = 0
    for j in range(REG):
        m = 0
        for u in vset:
            m |= _seed(u, j)
        total += _lub(m)
    return total


def _graph():
    # cycle, fan-out hub, pendant chain crossing into the cycle
    return [(0, 1), (1, 2), (2, 3), (3, 0), (10, 0), (10, 2), (10, 11),
            (11, 12), (12, 13), (13, 2), (20, 21)]


def test_anf_vertices_match_python_simulation(spark):
    df = spark.createDataFrame(_graph(), "src long, dst long")
    got = {
        r["vid"]: r["b_sum"]
        for r in anf_vertices(spark, df, hops=3, cfg=_cfg()).collect()
    }
    reach = _reach(_graph(), 3)[3]
    assert got == {v: _bsum(s) for v, s in reach.items()}


def test_anf_curve_matches_per_hop_simulation(spark):
    df = spark.createDataFrame(_graph(), "src long, dst long")
    rows = {r["hop"]: r for r in anf(spark, df, hops=3, cfg=_cfg()).collect()}
    reach = _reach(_graph(), 3)
    n = len(reach[1])
    for h in (1, 2, 3):
        assert rows[h]["n_verts"] == n
        assert rows[h]["sum_b"] == sum(_bsum(s) for s in reach[h].values())
    # masks only ever gain bits: the observable is hop-monotone
    assert rows[1]["sum_b"] <= rows[2]["sum_b"] <= rows[3]["sum_b"]


def test_nf_estimate_tracks_ball_size(spark):
    # a 64-vertex binary out-tree: the root's 6-hop ball is all 64
    edges = [(i, 2 * i + c) for i in range(1, 32) for c in (0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = [
        r for r in anf_vertices(spark, df, hops=6, cfg=_cfg()).collect()
        if r["vid"] == 1
    ][0]
    est = nf_estimate(row["b_sum"], 1, REG)
    assert 16 <= est <= 256  # FM with 4 registers: right order of magnitude
