"""rich_club: brute-force parity, known hub topology, conventions."""

from __future__ import annotations

import math
import random

from crgp_spark.operators.richclub import rich_club


def _brute(arcs):
    und = {
        (min(s, d), max(s, d)) for s, d in arcs if s != d
    }
    adj: dict = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    for k in sorted(set(deg.values())):
        rich = {v for v, d in deg.items() if d > k}
        nk, ek = len(rich), sum(
            1 for u, v in und if u in rich and v in rich
        )
        phi = (
            math.floor(2_000_000 * ek / (nk * (nk - 1)) + 0.5) / 1_000_000
            if nk >= 2
            else None
        )
        out[k] = (nk, ek, phi)
    return out


def _run(spark, arcs):
    df = spark.createDataFrame(sorted(arcs), "src long, dst long")
    return {
        r["k"]: (r["n_rich"], r["e_rich"], r["phi"])
        for r in rich_club(df).collect()
    }


def test_hub_clique_with_leaves(spark):
    # K3 core {0,1,2} each with 2 extra leaves -> hubs deg 4, leaves 1
    core = [(0, 1), (1, 2), (0, 2)]
    leaves = [(h, 10 * h + off) for h in range(3) for off in (1, 2)]
    got = _run(spark, core + leaves)
    # k=1: rich = the 3 hubs, all 3 core edges survive -> phi = 1.0
    assert got[1] == (3, 3, 1.0)
    # k=4: nobody has degree > 4
    assert got[4] == (0, 0, None)


def test_matches_bruteforce_on_random_graphs(spark):
    random.seed(13)
    for _ in range(2):
        arcs = {
            (s, d)
            for s in range(24)
            for d in range(24)
            if s != d and random.random() < 0.12
        }
        assert _run(spark, arcs) == _brute(arcs)


def test_direction_duplicates_and_self_loops_ignored(spark):
    got = _run(spark, [(1, 2), (2, 1), (1, 1), (2, 3)])
    assert got == _brute([(1, 2), (2, 3)])
