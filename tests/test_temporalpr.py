"""Temporal PageRank: hand-traced integer levels on a timed cycle,
time-respect (backwards edges carry nothing), brute-force parity."""

from __future__ import annotations

from crgp_spark.config import EngineConfig
from crgp_spark.operators.temporalpr import temporal_pagerank


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_tpr")


def _brute(edges, max_len, D, S):
    w = {e: S // D for e in edges}
    levels = [w]
    for _ in range(1, max_len):
        prev, nxt = levels[-1], {}
        for e in edges:
            s = sum(pw for pe, pw in prev.items()
                    if pe[1] == e[0] and pe[2] < e[2])
            if s:
                nxt[e] = s // D
        if not nxt:
            break
        levels.append(nxt)
    score = {}
    for lv in levels:
        for (src, dst, t), ww in lv.items():
            score[dst] = score.get(dst, 0) + ww
    verts = {v for e in edges for v in e[:2]}
    return {v: score.get(v, 0) for v in verts}


def test_hand_trace_timed_cycle(spark):
    # e3=(3,1,5), e1=(1,2,10), e2=(2,3,20): S=1000, D=2, L=3
    edges = [(1, 2, 10), (2, 3, 20), (3, 1, 5)]
    e = spark.createDataFrame(edges, "src long, dst long, t long")
    got = {r["vid"]: r["tpr_scaled"]
           for r in temporal_pagerank(spark, e, max_len=3, damp_den=2,
                                      scale=1000, cfg=_cfg()).collect()}
    # w1 = 500 each; w2(e1)=250 (from e3), w2(e2)=250 (from e1);
    # w3(e2)=125 (from w2(e1)) -> v1: 500, v2: 750, v3: 875
    assert got == {1: 500, 2: 750, 3: 875}
    assert got == _brute(edges, 3, 2, 1000)


def test_time_respect_blocks_backward_chains(spark):
    # 1->2 at t=20, 2->3 at t=10: the chain 1->2->3 is NOT time-
    # respecting, so no length-2 mass reaches 3.
    e = spark.createDataFrame([(1, 2, 20), (2, 3, 10)],
                              "src long, dst long, t long")
    got = {r["vid"]: r["tpr_scaled"]
           for r in temporal_pagerank(spark, e, max_len=3, damp_den=2,
                                      scale=1000, cfg=_cfg()).collect()}
    assert got == {1: 0, 2: 500, 3: 500}


def test_bruteforce_parity_random(spark):
    import random
    rng = random.Random(7)
    edges = list({(rng.randrange(6), rng.randrange(6), rng.randrange(50))
                  for _ in range(25)})
    edges = [e for e in edges if e[0] != e[1]]
    e = spark.createDataFrame(edges, "src long, dst long, t long")
    got = {r["vid"]: r["tpr_scaled"]
           for r in temporal_pagerank(spark, e, max_len=4, damp_den=3,
                                      scale=9999, cfg=_cfg()).collect()}
    assert got == _brute(edges, 4, 3, 9999)
