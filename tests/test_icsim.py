"""Independent-cascade simulation: exact hashlib replication of the
live-edge coins + BFS, p=1 reduces to plain BFS, p=0 isolates seeds,
monotone spread in p."""

from __future__ import annotations

import hashlib

from crgp_spark.config import EngineConfig
from crgp_spark.operators.icsim import independent_cascade, live_edges


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_ic")


EDGES = [
    (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (6, 7), (2, 7),
    (7, 8), (8, 9), (3, 9), (9, 1),
]


def _coin(src, dst, seed="ic"):
    h = hashlib.md5(f"{seed}:{src}|{dst}".encode()).hexdigest()
    return int(h[:8], 16)


def _brute(edges, p_num, p_den, n_seeds, rounds):
    live = [(s, d) for s, d in edges if _coin(s, d) % p_den < p_num]
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    seeds = [v for v, _ in sorted(outdeg.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:n_seeds]]
    act = {v: 0 for v in seeds}
    frontier = set(seeds)
    for r in range(1, rounds + 1):
        nxt = {d for s, d in live if s in frontier} - set(act)
        if not nxt:
            break
        for v in nxt:
            act[v] = r
        frontier = nxt
    return act


def _df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_exact_hashlib_replication(spark):
    e = _df(spark)
    lv = {(r["src"], r["dst"])
          for r in live_edges(e, 3, 10).collect()}
    want_live = {(s, d) for s, d in EDGES if _coin(s, d) % 10 < 3}
    assert lv == want_live
    got = {r["vid"]: r["round"]
           for r in independent_cascade(spark, e, 3, 10, n_seeds=2,
                                        rounds=4, cfg=_cfg()).collect()}
    assert got == _brute(EDGES, 3, 10, 2, 4)


def test_p_one_is_plain_bfs_and_p_zero_is_seeds(spark):
    e = _df(spark)
    full = {r["vid"]: r["round"]
            for r in independent_cascade(spark, e, 1, 1, n_seeds=2,
                                         rounds=4, cfg=_cfg()).collect()}
    assert full == _brute(EDGES, 1, 1, 2, 4)
    none = {r["vid"]: r["round"]
            for r in independent_cascade(spark, e, 0, 1, n_seeds=2,
                                         rounds=4, cfg=_cfg()).collect()}
    assert set(none.values()) == {0} and len(none) == 2


def test_monotone_spread_in_p(spark):
    e = _df(spark)
    sizes = [
        independent_cascade(spark, e, p, 10, n_seeds=2, rounds=4,
                            cfg=_cfg()).count()
        for p in (0, 3, 10)
    ]
    assert sizes[0] <= sizes[1] <= sizes[2]
