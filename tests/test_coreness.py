"""core_decomposition: independent peeling cross-check, known shapes,
fixed-round replay semantics."""

from __future__ import annotations

import heapq
import random

from crgp_spark.operators.coreness import core_decomposition


def _peel_core(arcs):
    """Classic sequential min-degree peeling — independent of the
    h-index iteration under test."""
    adj: dict = {}
    for s, d in arcs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    seen: set = set()
    core: dict = {}
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in seen or d != deg[v]:
            continue
        seen.add(v)
        k = max(k, deg[v])
        core[v] = k
        for u in adj[v]:
            if u not in seen:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return core


def _run(spark, arcs, **kw):
    df = spark.createDataFrame(sorted(arcs), "src long, dst long")
    return {
        r["vid"]: r["core"]
        for r in core_decomposition(spark, df, **kw).collect()
    }


def test_clique_with_tail(spark):
    # K4 (core 3) with a 2-vertex tail hanging off vertex 0 (core 1)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    arcs = k4 + [(0, 10), (10, 11)]
    got = _run(spark, arcs)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1}


def test_cycle_is_core_two(spark):
    arcs = [(i, (i + 1) % 6) for i in range(6)]
    assert set(_run(spark, arcs).values()) == {2}


def test_matches_peeling_on_random_graphs(spark):
    random.seed(5)
    for _ in range(2):
        arcs = {
            (s, d)
            for s in range(35)
            for d in range(35)
            if s != d and random.random() < 0.09
        }
        assert _run(spark, arcs) == _peel_core(arcs)


def test_direction_and_duplicates_ignored(spark):
    got = _run(spark, [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1)])
    assert got == {1: 2, 2: 2, 3: 2}


def test_fixed_rounds_past_fixpoint_is_identity(spark):
    arcs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _run(spark, arcs, fixed_rounds=9) == _run(spark, arcs)
