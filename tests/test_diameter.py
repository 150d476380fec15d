"""Exact per-component diameter (operators/diameter.py): double-sweep
+ batched iFUB vs a brute-force all-pairs BFS on fixture and random
graphs — including shapes where the double-sweep lower bound alone is
NOT the diameter (so the iFUB descent must actually run)."""

from __future__ import annotations

import collections
import random

from crgp_spark.config import EngineConfig
from crgp_spark.operators.diameter import component_diameters


def _cfg(tmp_path):
    return EngineConfig(
        shuffle_partitions=4,
        graph_partitions=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=10_000,
    )


def _brute(pairs):
    adj = collections.defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    seen_any = set()
    out = []
    for s in sorted(adj):
        if s in seen_any:
            continue
        group = [s]
        seen_any.add(s)
        stack = [s]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen_any:
                    seen_any.add(y)
                    group.append(y)
                    stack.append(y)
        diam = 0
        for a in group:
            seen = {a: 0}
            q = [a]
            while q:
                nq = []
                for x in q:
                    for y in adj[x]:
                        if y not in seen:
                            seen[y] = seen[x] + 1
                            nq.append(y)
                q = nq
            diam = max(diam, max(seen.values()))
        out.append((min(group), len(group), diam))
    return sorted(out)


def _run(spark, pairs, tmp_path):
    df = spark.createDataFrame(pairs, "src: long, dst: long")
    return sorted(
        map(tuple, component_diameters(spark, df, _cfg(tmp_path)).collect())
    )


def test_multi_component_fixture(spark, tmp_path):
    pairs = [(100 + i, 101 + i) for i in range(9)]  # 10-path: diam 9
    pairs += [(200, 201), (201, 202), (202, 200)]   # triangle: diam 1
    pairs += [(300, 301)]                            # edge: diam 1
    assert _run(spark, pairs, tmp_path) == [
        (100, 10, 9), (200, 3, 1), (300, 2, 1),
    ]


def test_star_and_grid_need_ifub(spark, tmp_path):
    # star: any double sweep from a leaf gives ecc 2 = diameter — but
    # a 3x4 grid's double sweep can start mid-edge; brute certifies
    pairs = [(1, 10 + i) for i in range(6)]  # star, diam 2
    grid = {}
    nid = 100
    for r in range(3):
        for c in range(4):
            grid[(r, c)] = nid
            nid += 1
    for (r, c), v in grid.items():
        if (r + 1, c) in grid:
            pairs.append((v, grid[(r + 1, c)]))
        if (r, c + 1) in grid:
            pairs.append((v, grid[(r, c + 1)]))
    assert _run(spark, pairs, tmp_path) == _brute(pairs)


def test_random_graphs_match_brute_force(spark, tmp_path):
    rng = random.Random(23)
    pairs = []
    for comp in range(3):
        base = comp * 1000
        n = 12 + 4 * comp
        pairs += [(base + i, base + i + 1) for i in range(1, n, 2)]
        pairs += [
            (base + rng.randint(1, n), base + rng.randint(1, n))
            for _ in range(n + 4)
        ]
    pairs = [p for p in pairs if p[0] != p[1]]
    assert _run(spark, pairs, tmp_path) == _brute(pairs)
