"""hierarchy: closure == brute force, depth/root/subtree parity on
random forests, deep-chain doubling, parent_tree monotone collapse."""

from __future__ import annotations

import random

import pytest

from crgp_spark.operators.hierarchy import (
    ancestor_closure,
    parent_tree,
    tree_stats,
)


def _brute_stats(par: dict[int, int]) -> dict[int, tuple[int, int, int]]:
    verts = set(par) | set(par.values())
    depth, root = {}, {}
    for v in verts:
        d, a = 0, v
        while a in par:
            a = par[a]
            d += 1
        depth[v], root[v] = d, a
    sub = {v: 1 for v in verts}
    for v in verts:
        a = v
        while a in par:
            a = par[a]
            sub[a] += 1
    return {v: (depth[v], root[v], sub[v]) for v in verts}


def _spark_stats(spark, par: dict[int, int]):
    df = spark.createDataFrame(
        sorted((v, p) for v, p in par.items()), "vid long, parent long"
    )
    return {
        r["vid"]: (r["depth"], r["root"], r["subtree_n"])
        for r in tree_stats(spark, df).collect()
    }


def _random_forest(n: int, seed: int) -> dict[int, int]:
    rng = random.Random(seed)
    par = {}
    for v in range(1, n):
        if rng.random() < 0.8:  # 20% extra roots
            par[v] = rng.randrange(v)  # parent < child: a forest
    return par


@pytest.mark.parametrize("seed", [3, 17])
def test_matches_bruteforce_on_random_forests(spark, seed):
    par = _random_forest(60, seed)
    assert _spark_stats(spark, par) == _brute_stats(par)


def test_deep_chain_in_log_rounds(spark):
    """A 70-deep chain must close in ~7 doubling rounds, far below the
    64-round guard — and produce all 70·71/2 ancestor pairs exactly."""
    par = {v: v - 1 for v in range(1, 71)}
    df = spark.createDataFrame(
        sorted(par.items()), "vid long, parent long"
    )
    anc = ancestor_closure(spark, df, max_rounds=8)  # 2^8 > 70
    rows = anc.collect()
    assert len(rows) == 70 * 71 // 2
    got = {(r["vid"], r["anc"]): r["d"] for r in rows}
    assert got[(70, 0)] == 70 and got[(1, 0)] == 1
    assert _spark_stats(spark, par) == _brute_stats(par)


def test_parent_tree_latest_strictly_earlier(spark):
    edges = spark.createDataFrame(
        [(1, 5), (3, 5), (9, 5), (2, 4), (4, 4)],
        "src long, dst long",
    )
    got = {
        r["vid"]: r["parent"] for r in parent_tree(edges).collect()
    }
    # 9 -> 5 dropped (src >= dst is never a parent); 4's self-loop dropped
    assert got == {5: 3, 4: 2}


def test_cycle_guard_raises(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1)], "vid long, parent long"
    )
    with pytest.raises(RuntimeError, match="acyclic"):
        ancestor_closure(spark, df, max_rounds=4)
