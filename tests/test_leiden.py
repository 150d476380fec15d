"""Leiden refinement (operators/louvain.py::refine_partition / leiden,
Traag, Waltman & van Eck 2019): the connectivity-guarantee fix for
Louvain's badly-connected communities.

The star fixture reproduces the paper's Fig.-2 pathology WITH THE REAL
MOVE KERNEL: two wings attach to a bridge vertex, the wings join the
bridge's community in round 0, and a heavy external edge pulls the
bridge away in round 1 — stranding the wings in a community whose
induced subgraph is DISCONNECTED.  (The vertex ids were searched so
the rotating-priority schedule produces exactly that move order —
priorities are md5(vid:round), so the schedule is an id-dependent
deterministic function.)  Leiden must refuse that output: after
refinement every community's induced subgraph is connected."""

from __future__ import annotations

import collections

from crgp_spark.config import EngineConfig
from crgp_spark.operators.louvain import (
    leiden,
    louvain_moves,
    refine_partition,
)


def _cfg(tmp_path):
    return EngineConfig(
        shuffle_partitions=4,
        graph_partitions=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=10_000,
    )


# (L1, L2, B, R1, R2, H, H2) — wings {L1, L2} and {R1, R2} attach to
# bridge B (weight 3 each, wing-internal weight 1); hub H pulls B away
# with weight 25.  Under the md5(vid:round) schedule these ids make the
# wings join B in round 0 and B defect to H in round 1.
_IDS = (134, 67, 16, 141, 4, 24, 185)


def _pathology_edges():
    L1, L2, B, R1, R2, H, H2 = _IDS
    return [
        (L1, L2, 1), (L1, B, 3), (L2, B, 3),
        (R1, R2, 1), (R1, B, 3), (R2, B, 3),
        (B, H, 25), (H, H2, 1),
    ]


def _adj(wpairs):
    adj = collections.defaultdict(set)
    for u, v, _w in wpairs:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def _disconnected_comms(assign, adj):
    """Communities whose induced subgraph is not connected."""
    comms = collections.defaultdict(list)
    for v, c in assign.items():
        comms[c].append(v)
    bad = []
    for c, vs in comms.items():
        if len(vs) < 2:
            continue
        vset, seen, stack = set(vs), {vs[0]}, [vs[0]]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y in vset and y not in seen:
                    seen.add(y)
                    stack.append(y)
        if len(seen) < len(vs):
            bad.append(c)
    return bad


def test_louvain_strands_a_disconnected_community(spark, tmp_path):
    wpairs = _pathology_edges()
    df = spark.createDataFrame(wpairs, "src: long, dst: long, w: long")
    st = {
        r.vid: r.comm
        for r in louvain_moves(
            spark, df, _cfg(tmp_path), rounds=2, weight_col="w"
        ).state.collect()
    }
    bad = _disconnected_comms(st, _adj(wpairs))
    assert bad, st  # the pathology must reproduce — fixture contract


def test_refinement_refuses_disconnected_communities(spark, tmp_path):
    cfg = _cfg(tmp_path)
    wpairs = _pathology_edges()
    df = spark.createDataFrame(wpairs, "src: long, dst: long, w: long")
    louv = louvain_moves(
        spark, df, cfg, rounds=2, weight_col="w"
    ).state.select("vid", "comm")
    refined = {
        r.vid: r.comm
        for r in refine_partition(
            spark, df, louv, cfg, weight_col="w"
        ).collect()
    }
    adj = _adj(wpairs)
    assert not _disconnected_comms(refined, adj), refined
    # refinement only SPLITS: every refined community is a subset of
    # its Louvain community
    louv_map = {r.vid: r.comm for r in louv.collect()}
    groups = collections.defaultdict(set)
    for v, c in refined.items():
        groups[c].add(louv_map[v])
    assert all(len(parents) == 1 for parents in groups.values())
    # and labels are the part minimum
    parts = collections.defaultdict(list)
    for v, c in refined.items():
        parts[c].append(v)
    assert all(c == min(vs) for c, vs in parts.items())


def test_multilevel_leiden_connected_everywhere(spark, tmp_path):
    import random

    rng = random.Random(17)
    wpairs = _pathology_edges()
    # a second, larger random component
    wpairs += [
        (1000 + rng.randint(1, 30), 1000 + rng.randint(1, 30), 1)
        for _ in range(60)
    ]
    wpairs = [(u, v, w) for u, v, w in wpairs if u != v]
    df = spark.createDataFrame(wpairs, "src: long, dst: long, w: long")
    out = {
        r.vid: r.comm
        for r in leiden(
            spark, df, _cfg(tmp_path), levels=2, rounds=2, weight_col="w"
        ).collect()
    }
    assert not _disconnected_comms(out, _adj(wpairs)), out
    verts = {x for u, v, _ in wpairs for x in (u, v)}
    assert set(out) == verts
