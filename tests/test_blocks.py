"""Biconnected components + articulation points (operators/blocks.py):
fixture graphs with known answers, plus brute-force cross-checks —
blocks against a textbook sequential biconnectivity pass, articulation
points against per-vertex-removal component counting."""

from __future__ import annotations

import collections
import random

from crgp_spark.config import EngineConfig
from crgp_spark.operators.blocks import articulation_points, blocks


def _cfg(tmp_path):
    return EngineConfig(
        shuffle_partitions=4,
        graph_partitions=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=10_000,
    )


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


def _blocks(spark, pairs, tmp_path):
    df = blocks(spark, _edges(spark, pairs), _cfg(tmp_path))
    part = collections.defaultdict(set)
    for r in df.collect():
        part[r["block"]].add((r["u"], r["v"]))
    return {frozenset(s) for s in part.values()}


def _art(spark, pairs, tmp_path):
    df = articulation_points(spark, _edges(spark, pairs), _cfg(tmp_path))
    return sorted(r["vid"] for r in df.collect())


def test_path_every_edge_own_block(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (3, 4)]
    assert _blocks(spark, pairs, tmp_path) == {
        frozenset({(1, 2)}), frozenset({(2, 3)}), frozenset({(3, 4)})
    }
    assert _art(spark, pairs, tmp_path) == [2, 3]


def test_triangle_one_block_no_cuts(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (3, 1)]
    assert _blocks(spark, pairs, tmp_path) == {
        frozenset({(1, 2), (1, 3), (2, 3)})
    }
    assert _art(spark, pairs, tmp_path) == []


def test_bowtie(spark, tmp_path):
    # two triangles sharing vertex 3: two blocks, cut vertex 3
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)]
    assert _blocks(spark, pairs, tmp_path) == {
        frozenset({(1, 2), (2, 3), (1, 3)}),
        frozenset({(3, 4), (4, 5), (3, 5)}),
    }
    assert _art(spark, pairs, tmp_path) == [3]


def test_barbell_bridge_is_own_block(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    assert _blocks(spark, pairs, tmp_path) == {
        frozenset({(1, 2), (2, 3), (1, 3)}),
        frozenset({(3, 4)}),
        frozenset({(4, 5), (5, 6), (4, 6)}),
    }
    assert _art(spark, pairs, tmp_path) == [3, 4]


def _brute(pairs):
    """Sequential biconnectivity (iterative Hopcroft-Tarjan, edge
    stack) + articulation via per-vertex removal."""
    simple = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = collections.defaultdict(set)
    verts = set()
    for u, v in simple:
        adj[u].add(v)
        adj[v].add(u)
        verts.update((u, v))

    def n_comps(vs, es):
        a = collections.defaultdict(list)
        for u, v in es:
            a[u].append(v)
            a[v].append(u)
        seen, n = set(), 0
        for s in vs:
            if s in seen:
                continue
            n += 1
            stack = [s]
            seen.add(s)
            while stack:
                x = stack.pop()
                for y in a[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
        return n

    # removing a non-isolated v disconnects iff the component count
    # RISES (its own component never vanishes: v always has a neighbor)
    base = n_comps(verts, simple)
    art = sorted(
        v
        for v in verts
        if n_comps(verts - {v}, {e for e in simple if v not in e}) > base
    )

    # blocks: recursive Tarjan with explicit stack of edges
    import sys

    sys.setrecursionlimit(10000)
    disc, low = {}, {}
    estack, out = [], []
    t = [0]

    def dfs(u, parent_edge):
        t[0] += 1
        disc[u] = low[u] = t[0]
        for w in sorted(adj[u]):
            e = tuple(sorted((u, w)))
            if e == parent_edge:
                continue
            if w not in disc:
                estack.append(e)
                dfs(w, e)
                low[u] = min(low[u], low[w])
                if low[w] >= disc[u]:
                    blk = set()
                    while True:
                        f = estack.pop()
                        blk.add(f)
                        if f == e:
                            break
                    out.append(frozenset(blk))
            elif disc[w] < disc[u]:
                estack.append(e)
                low[u] = min(low[u], disc[w])

    for s in sorted(verts):
        if s not in disc:
            dfs(s, None)
    return {frozenset(b) for b in out}, art


def test_matches_brute_force_on_random_graph(spark, tmp_path):
    rng = random.Random(7)
    n = 35
    pairs = [(i, i + 1) for i in range(1, n, 4)]
    pairs += [
        (rng.randrange(1, n + 1), rng.randrange(1, n + 1)) for _ in range(40)
    ]
    want_blocks, want_art = _brute(pairs)
    assert _blocks(spark, pairs, tmp_path) == want_blocks
    assert _art(spark, pairs, tmp_path) == want_art


def test_matches_brute_force_dense_pockets(spark, tmp_path):
    # chained cliques with bridge links — many nested blocks
    pairs = []
    for b in range(3):
        base = 10 * b
        clique = [base + i for i in range(1, 5)]
        pairs += [
            (x, y) for i, x in enumerate(clique) for y in clique[i + 1:]
        ]
        if b:
            pairs.append((base - 10 + 1, base + 1))
    want_blocks, want_art = _brute(pairs)
    assert _blocks(spark, pairs, tmp_path) == want_blocks
    assert _art(spark, pairs, tmp_path) == want_art
