"""Luby-style MIS: python-simulation cross-check + set properties."""

from __future__ import annotations

import hashlib

from crgp_spark.config import EngineConfig
from crgp_spark.operators.mis import maximal_independent_set


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_mis")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _simulate(edges, rounds):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    active, res = set(adj), {}
    for r in range(1, rounds + 1):
        winners = {
            v
            for v in active
            if all(
                _md5(f"{v}:{r}") < _md5(f"{u}:{r}")
                for u in adj[v] & active
            )
        }
        losers = set().union(*(adj[w] for w in winners)) & active - winners
        for w in winners:
            res[w] = ("mis", r)
        for v in losers:
            res[v] = ("out", r)
        active -= winners | losers
    for v in active:
        res[v] = ("open", 0)
    return res


def _graph():
    # two components incl. a cycle, a star and a pendant chain
    return [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (10, 11), (10, 12),
            (10, 13), (13, 14), (14, 15)]


def test_mis_matches_python_simulation(spark):
    df = spark.createDataFrame(_graph(), "src long, dst long")
    got = {
        r["vid"]: (r["status"], r["rnd"])
        for r in maximal_independent_set(spark, df, rounds=4, cfg=_cfg()).collect()
    }
    assert got == _simulate(_graph(), 4)


def test_mis_is_independent_and_maximal(spark):
    edges = [(i, (i * 7 + 3) % 23) for i in range(23)] + [(i, i + 1) for i in range(22)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = maximal_independent_set(spark, df, rounds=8, cfg=_cfg()).collect()
    status = {r["vid"]: r["status"] for r in rows}
    assert "open" not in status.values()  # 8 rounds drains a 23-vertex graph
    mis = {v for v, s in status.items() if s == "mis"}
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    for v in mis:
        assert not (adj[v] & mis)  # independent
    for v, s in status.items():
        if s == "out":
            assert adj[v] & mis  # every excluded vertex has a MIS neighbor
