"""edge_jaccard + sparsify_topk: brute-force parity on random graphs,
local-bridge detection, sparsification keeps community backbones."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from crgp_spark.operators.graphstats import edge_jaccard, sparsify_topk


def _brute(und):
    nbr: dict[int, set[int]] = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    out = {}
    for u, v in und:
        common = len(nbr[u] & nbr[v] - {u, v})
        du, dv = len(nbr[u]), len(nbr[v])
        denom = du + dv - 2 - common
        out[(u, v)] = (
            common,
            du,
            dv,
            common / denom if denom > 0 else 0.0,
        )
    return out


def _random_graph(n=25, m=60, seed=12):
    rng = random.Random(seed)
    es = set()
    while len(es) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            es.add((min(a, b), max(a, b)))
    return sorted(es)


def test_matches_bruteforce(spark):
    und = _random_graph()
    df = spark.createDataFrame(und, "src long, dst long")
    got = {
        (r["u"], r["v"]): (r["common"], r["deg_u"], r["deg_v"], r["jaccard"])
        for r in edge_jaccard(df).collect()
    }
    assert got == _brute(und)


def test_local_bridge_and_isolated_edge(spark):
    # two triangles joined by one bridge, plus an isolated edge
    es = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4), (8, 9)]
    df = spark.createDataFrame(es, "src long, dst long")
    got = {(r["u"], r["v"]): r for r in edge_jaccard(df).collect()}
    assert got[(3, 4)]["common"] == 0 and got[(3, 4)]["jaccard"] == 0.0
    assert got[(8, 9)]["jaccard"] == 0.0  # degree-1 endpoints: denom 0
    assert got[(1, 2)]["common"] == 1 and got[(1, 2)]["jaccard"] == 1.0
    # (2,3): N(2)={1,3}, N(3)={1,2,4} -> common {1}, union size 2
    assert got[(2, 3)]["common"] == 1 and got[(2, 3)]["jaccard"] == 0.5


def test_sparsify_keeps_topk_union(spark):
    und = _random_graph(n=20, m=50, seed=3)
    df = spark.createDataFrame(und, "src long, dst long")
    ej = edge_jaccard(df)
    kept = sparsify_topk(ej, k=2)
    kept_set = {(r["u"], r["v"]) for r in kept.collect()}
    # brute-force the OR-of-topk rule
    full = {
        (r["u"], r["v"]): (r["jaccard"], r["common"])
        for r in ej.collect()
    }
    want = set()
    verts = {x for e in full for x in e}
    for x in verts:
        mine = [
            ((u, v), j, c, (v if u == x else u))
            for (u, v), (j, c) in full.items()
            if x in (u, v)
        ]
        mine.sort(key=lambda t: (-t[1], -t[2], t[3]))
        want |= {e for e, *_ in mine[:2]}
    assert kept_set == want
    assert kept_set and len(kept_set) < len(full)
