"""Euler-tour interval substrate (operators/euler.py): the
scale-safe replacement for the former O(V·depth) ancestor closure.

Covers all three constructions (unrolled shallow plan, rooted list
ranking, deep Borůvka + unrooted rooting) against a sequential Python
DFS replica, and the deep-graph regression the closure could not pass:
a 1,000-deep chain, where BFS-forest construction alone would need
1,000 supersteps (the former path capped out and produced a partial
forest — wrong answers — long before its O(V·depth) row blowup even
mattered)."""

from __future__ import annotations

import collections
import random
import sys

import pytest
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.operators import euler
from crgp_spark.operators.blocks import blocks
from crgp_spark.operators.bridges import _canonical, bfs_forest, bridges


def _cfg(tmp_path):
    return EngineConfig(
        shuffle_partitions=4,
        graph_partitions=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=10_000,
    )


def _forest_and_nontree(spark, pairs, cfg):
    df = spark.createDataFrame(pairs, "src: long, dst: long")
    und = _canonical(df).localCheckpoint(eager=True)
    forest = bfs_forest(
        spark,
        und.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        cfg,
    )
    tree = forest.filter(F.col("parent").isNotNull()).select(
        F.least("vid", "parent").alias("u"),
        F.greatest("vid", "parent").alias("v"),
    )
    nontree = und.join(tree, ["u", "v"], "left_anti").localCheckpoint(
        eager=True
    )
    return und, forest, nontree


def _python_replica(forest_rows, nontree_rows):
    """Sequential child-sorted DFS: tin/tout/size/low/high per vertex."""
    sys.setrecursionlimit(100_000)
    children = collections.defaultdict(list)
    roots = []
    for r in forest_rows:
        if r["parent"] is None:
            roots.append(r["vid"])
        else:
            children[r["parent"]].append(r["vid"])
    for p in children:
        children[p].sort()
    tin, tout, size = {}, {}, {}
    for root in sorted(roots):
        ctr = [0]
        stack = [(root, False)]
        while stack:
            v, done = stack.pop()
            if done:
                tout[v] = ctr[0] - 1
                size[v] = tout[v] - tin[v] + 1
                continue
            tin[v] = ctr[0]
            ctr[0] += 1
            stack.append((v, True))
            for c in reversed(children.get(v, [])):
                stack.append((c, False))
    adjnt = collections.defaultdict(list)
    for u, v in nontree_rows:
        adjnt[u].append(v)
        adjnt[v].append(u)
    low, high = {}, {}

    def agg(v):
        lo = min([tin[v]] + [tin[x] for x in adjnt[v]])
        hi = max([tin[v]] + [tin[x] for x in adjnt[v]])
        for c in children.get(v, []):
            cl, ch = agg(c)
            lo, hi = min(lo, cl), max(hi, ch)
        low[v], high[v] = lo, hi
        return lo, hi

    for root in roots:
        agg(root)
    return tin, tout, size, low, high


def _check_substrate(sub_rows, forest_rows, nontree_rows):
    tin, tout, size, low, high = _python_replica(forest_rows, nontree_rows)
    assert len(sub_rows) == len(forest_rows)
    for r in sub_rows:
        assert (r["tin"], r["tout"], r["size"], r["low"], r["high"]) == (
            tin[r["vid"]], tout[r["vid"]], size[r["vid"]],
            low[r["vid"]], high[r["vid"]],
        ), f"vid {r['vid']}"


def _random_pairs(seed, n_verts, n_edges):
    rng = random.Random(seed)
    pairs = [(i, i + 1) for i in range(1, n_verts, 3)]
    pairs += [
        (rng.randrange(1, n_verts + 1), rng.randrange(1, n_verts + 1))
        for _ in range(n_edges)
    ]
    return pairs


def test_unrolled_matches_python_dfs(spark, tmp_path):
    cfg = _cfg(tmp_path)
    und, forest, nontree = _forest_and_nontree(
        spark, _random_pairs(3, 40, 50), cfg
    )
    maxd = int(forest.agg(F.max("dist")).collect()[0][0])
    assert maxd <= euler.UNROLL_MAX_DEPTH  # exercises the unrolled path
    sub = euler.interval_substrate(spark, forest, nontree, cfg)
    _check_substrate(
        sub.collect(), forest.collect(),
        [tuple(r) for r in nontree.select("u", "v").collect()],
    )


def test_listrank_matches_python_dfs(spark, tmp_path):
    """Rooted list ranking (forced) equals the same child-sorted DFS —
    the two constructions are label-identical by design."""
    cfg = _cfg(tmp_path)
    pairs = [(i, i + 1) for i in range(1, 30)] + [(5, 25), (10, 20)]
    und, forest, nontree = _forest_and_nontree(spark, pairs, cfg)
    sub = euler._substrate_listrank(spark, forest, nontree, cfg)
    _check_substrate(
        sub.collect(), forest.collect(),
        [tuple(r) for r in nontree.select("u", "v").collect()],
    )


def test_deep_chain_bridges_within_budget(spark, tmp_path):
    """1,000-deep chain + two chords: the O(depth)-superstep BFS/closure
    path cannot finish this (1,000 supersteps for the forest alone); the
    deep path (Borůvka + unrooted Euler rooting + sparse-table RMQ) is
    O(log n) supersteps throughout and must answer exactly."""
    cfg = _cfg(tmp_path)
    n = 1000
    pairs = [(i, i + 1) for i in range(1, n)] + [(100, 300), (500, 900)]
    df = spark.createDataFrame(pairs, "src: long, dst: long")
    got = set(map(tuple, bridges(spark, df, cfg).collect()))
    want = {
        (i, i + 1)
        for i in range(1, n)
        if not (100 <= i < 300 or 500 <= i < 900)
    }
    assert got == want


def test_deep_chain_blocks_and_articulation(spark, tmp_path):
    """Blocks on a 400-deep chain with one chord: the cycle span is one
    block, every other edge its own bridge block; articulation points
    are all interior chain vertices plus the cycle endpoints."""
    from crgp_spark.operators.blocks import articulation_points

    cfg = _cfg(tmp_path)
    n = 400
    pairs = [(i, i + 1) for i in range(1, n)] + [(100, 300)]
    df = spark.createDataFrame(pairs, "src: long, dst: long")
    b = {(r["u"], r["v"]): r["block"] for r in blocks(spark, df, cfg).collect()}
    cycle_edges = [(i, i + 1) for i in range(100, 300)] + [(100, 300)]
    labels = {b[e] for e in cycle_edges}
    assert len(labels) == 1  # one biconnected block for the whole cycle
    for i in range(1, n):
        if not (100 <= i < 300):
            assert b[(i, i + 1)] not in labels
            assert len([1 for e, lb in b.items() if lb == b[(i, i + 1)]]) == 1
    arts = {
        r["vid"] for r in articulation_points(spark, df, cfg).collect()
    }
    want = {i for i in range(2, n) if not (100 < i < 300)}
    assert arts == want


def test_deep_substrate_matches_python_dfs(spark, tmp_path):
    """The unrooted deep path produces a DIFFERENT (but valid) DFS
    order; checked against a replica running the same plain sorted
    cyclic order on the same Borůvka forest."""
    from crgp_spark.operators.msf import minimum_spanning_forest

    cfg = _cfg(tmp_path)
    pairs = _random_pairs(11, 60, 80)
    df = spark.createDataFrame(pairs, "src: long, dst: long")
    und = _canonical(df).localCheckpoint(eager=True)
    sub = euler._deep_substrate(spark, und, cfg)
    # replica: same forest (lexicographic-minimum spanning forest),
    # rooted at component minima, children sorted ascending — for the
    # plain cyclic successor order with the cut at the root's wrap,
    # the induced DFS visits each vertex's tree neighbors in ascending
    # order starting after the parent (root: plain ascending)
    fe = [
        tuple(r)
        for r in minimum_spanning_forest(
            spark,
            und.select(
                F.col("u").alias("src"), F.col("v").alias("dst"),
                F.lit(0).alias("w"),
            ),
            cfg,
        ).select("u", "v").collect()
    ]
    nt = sorted(
        set(tuple(r) for r in und.collect()) - set(fe)
    )
    adj = collections.defaultdict(list)
    for u, v in fe:
        adj[u].append(v)
        adj[v].append(u)
    for x in adj:
        adj[x].sort()
    verts = sorted(adj)
    seen = set()
    tin, tout, size = {}, {}, {}
    for root in verts:
        if root in seen:
            continue
        ctr = [0]

        def dfs(v, parent):
            seen.add(v)
            tin[v] = ctr[0]
            ctr[0] += 1
            nbrs = adj[v]
            if parent is None:
                order = nbrs
            else:
                i = nbrs.index(parent)
                order = nbrs[i + 1:] + nbrs[:i]
            for c in order:
                if c not in seen:
                    dfs(c, v)
            tout[v] = ctr[0] - 1
            size[v] = tout[v] - tin[v] + 1

        sys.setrecursionlimit(100_000)
        dfs(root, None)
    adjnt = collections.defaultdict(list)
    for u, v in nt:
        adjnt[u].append(v)
        adjnt[v].append(u)
    low, high = {}, {}

    def agg(v, parent):
        lo = min([tin[v]] + [tin[x] for x in adjnt[v]])
        hi = max([tin[v]] + [tin[x] for x in adjnt[v]])
        for c in adj[v]:
            if c != parent and tin[c] > tin[v] and tin[c] <= tout[v]:
                cl, ch = agg(c, v)
                lo, hi = min(lo, cl), max(hi, ch)
        low[v], high[v] = lo, hi
        return lo, hi

    roots = [v for v in verts if tin[v] == 0]
    for root in roots:
        agg(root, None)
    got = {r["vid"]: r for r in sub.collect()}
    assert set(got) == set(verts)
    for v in verts:
        r = got[v]
        assert (r["tin"], r["tout"], r["size"], r["low"], r["high"]) == (
            tin[v], tout[v], size[v], low[v], high[v]
        ), f"vid {v}"


def test_empty_and_single_edge(spark, tmp_path):
    cfg = _cfg(tmp_path)
    df = spark.createDataFrame([(1, 2)], "src: long, dst: long")
    got = sorted(map(tuple, bridges(spark, df, cfg).collect()))
    assert got == [(1, 2)]
