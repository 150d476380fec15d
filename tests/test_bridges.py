"""Bridges + 2-edge-connected components (operators/bridges.py):
fixture graphs with known answers, plus a brute-force cross-check
(remove each edge, test connectivity) on a deterministic graph."""

from __future__ import annotations

import collections
import random

from crgp_spark.config import EngineConfig
from crgp_spark.operators.bridges import (
    bfs_forest,
    bridges,
    two_edge_components,
)


def _cfg(tmp_path):
    return EngineConfig(
        shuffle_partitions=4,
        graph_partitions=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=10_000,
    )


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


def _br(spark, pairs, tmp_path):
    df = bridges(spark, _edges(spark, pairs), _cfg(tmp_path))
    return sorted(map(tuple, df.collect()))


def _ecc2(spark, pairs, tmp_path):
    df = two_edge_components(spark, _edges(spark, pairs), _cfg(tmp_path))
    return sorted(map(tuple, df.collect()))


def test_path_is_all_bridges(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (3, 4)]
    assert _br(spark, pairs, tmp_path) == [(1, 2), (2, 3), (3, 4)]
    assert _ecc2(spark, pairs, tmp_path) == [(1, 1), (2, 2), (3, 3), (4, 4)]


def test_cycle_has_no_bridges(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (3, 1)]
    assert _br(spark, pairs, tmp_path) == []
    assert _ecc2(spark, pairs, tmp_path) == [(1, 1), (2, 1), (3, 1)]


def test_barbell(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    assert _br(spark, pairs, tmp_path) == [(3, 4)]
    assert _ecc2(spark, pairs, tmp_path) == [
        (1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4),
    ]


def test_pendant_off_cycle_and_second_component(spark, tmp_path):
    # cycle 2-3-4 hanging off bridge 1-2; separate bridge component 10-11
    pairs = [(1, 2), (2, 3), (3, 4), (4, 2), (10, 11)]
    assert _br(spark, pairs, tmp_path) == [(1, 2), (10, 11)]


def test_chord_kills_bridges(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    assert _br(spark, pairs, tmp_path) == []


def test_parallel_and_self_edges_collapse(spark, tmp_path):
    # duplicates and self-loops are dropped: simple-graph semantics
    pairs = [(1, 2), (2, 1), (1, 1), (2, 3)]
    assert _br(spark, pairs, tmp_path) == [(1, 2), (2, 3)]


def test_forest_is_valid_spanning_tree(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    f = {
        r["vid"]: (r["comp"], r["dist"], r["parent"])
        for r in bfs_forest(
            spark, _edges(spark, pairs), _cfg(tmp_path)
        ).collect()
    }
    assert set(f) == {1, 2, 3, 4, 5, 6}
    assert f[1] == (1, 0, None)  # root = component min
    for v, (comp, dist, parent) in f.items():
        assert comp == 1
        if v != 1:
            assert f[parent][1] == dist - 1  # parent one hop closer


def _brute_bridges(pairs):
    simple = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}

    def n_comps(edge_set):
        adj = collections.defaultdict(list)
        verts = set()
        for u, v in edge_set:
            adj[u].append(v)
            adj[v].append(u)
        for u, v in simple:
            verts.update((u, v))
        seen, n = set(), 0
        for s in verts:
            if s in seen:
                continue
            n += 1
            stack = [s]
            seen.add(s)
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
        return n

    base = n_comps(simple)
    return sorted(
        e for e in simple if n_comps(simple - {e}) > base
    )


def test_matches_brute_force_on_random_graph(spark, tmp_path):
    rng = random.Random(42)
    n = 40
    pairs = [(i, i + 1) for i in range(1, n, 3)]  # scattered path bits
    pairs += [
        (rng.randrange(1, n + 1), rng.randrange(1, n + 1)) for _ in range(45)
    ]
    want = _brute_bridges(pairs)
    assert _br(spark, pairs, tmp_path) == want
    # 2ECC cross-check: same class iff connected without bridges
    nonbridge = {
        tuple(sorted(p)) for p in pairs if p[0] != p[1]
    } - set(want)
    lab = {}
    for u, v in sorted(nonbridge):
        ru = lab.setdefault(u, u)
        while lab[ru] != ru:
            ru = lab[ru]
        rv = lab.setdefault(v, v)
        while lab[rv] != rv:
            rv = lab[rv]
        if ru != rv:
            lab[max(ru, rv)] = min(ru, rv)

    def root(x):
        r = lab.get(x, x)
        while lab.get(r, r) != r:
            r = lab[r]
        return r

    got = dict(_ecc2(spark, pairs, tmp_path))
    verts = {x for p in pairs for x in p if p[0] != p[1]}
    want2 = {}
    for v in verts:
        want2.setdefault(root(v), []).append(v)
    # compare partitions (labels are min-vid in both)
    want_map = {v: min(grp) for grp in want2.values() for v in grp}
    assert got == want_map


def test_cascade_kernel_matches_generic(spark, tmp_path):
    """cascade_bridges (one LCA-walk kernel per conversation) equals
    the generic superstep path on multi-conversation random input."""
    import random

    from pyspark.sql import functions as F

    from crgp_spark.operators.cascade_algos import cascade_bridges

    rng = random.Random(99)
    rows = []
    for conv in range(1, 6):
        base = conv * 1000
        n = 12 + conv
        rows += [(base + i, base + i + 1, conv) for i in range(1, n, 3)]
        rows += [
            (base + rng.randrange(1, n + 1), base + rng.randrange(1, n + 1), conv)
            for _ in range(18)
        ]
    df = spark.createDataFrame(rows, "src: long, dst: long, conv_id: long")
    got = sorted(
        map(tuple, cascade_bridges(spark, df, _cfg(tmp_path)).collect())
    )
    want = sorted(
        map(
            tuple,
            bridges(
                spark, df.select("src", "dst"), _cfg(tmp_path)
            ).collect(),
        )
    )
    assert got == want
    assert want == _brute_bridges([(u, v) for u, v, _c in rows])


def test_cascade_split_residue_path(spark, tmp_path, monkeypatch):
    """Conversations above the kernel cap route through the generic
    path and union back in — force it by shrinking the cap."""
    from crgp_spark.operators import cascade_algos

    monkeypatch.setattr(cascade_algos, "RESIDUE_KERNEL_MAX_EDGES", 6)
    pairs_small = [(1, 2, 1), (2, 3, 1), (3, 1, 1), (3, 4, 1)]  # 4 edges
    big = [(100 + i, 100 + i + 1, 2) for i in range(1, 9)]      # 8 edges
    df = spark.createDataFrame(
        pairs_small + big, "src: long, dst: long, conv_id: long"
    )
    got = sorted(
        map(
            tuple,
            cascade_algos.cascade_bridges(spark, df, _cfg(tmp_path)).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            bridges(spark, df.select("src", "dst"), _cfg(tmp_path)).collect(),
        )
    )
    assert got == want and (3, 4) in got
