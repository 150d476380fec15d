"""Eigenvector centrality: hand-traced integer rounds on a cycle+spur,
brute-force python replication, and sink decay."""

from __future__ import annotations

from crgp_spark.config import EngineConfig
from crgp_spark.operators.eigencent import eigenvector_centrality


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_eig")


def _brute(edges, rounds, S=1_000_000):
    verts = sorted({v for e in edges for v in e})
    x = {v: S for v in verts}
    for _ in range(rounds):
        r = {v: 0 for v in verts}
        for s, d in edges:
            r[d] += x[s]
        m = max(r.values())
        x = {v: (r[v] * S) // m if m > 0 else 0 for v in verts}
    return x


def test_brute_force_parity(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 2), (5, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["vid"]: r["eig_scaled"]
        for r in eigenvector_centrality(
            spark, e, cfg=_cfg(), fixed_iterations=3
        ).collect()
    }
    assert got == _brute(edges, 3)
    # max-rescale pins the top vertex at exactly S
    assert max(got.values()) == 1_000_000


def test_sources_decay_to_zero(spark):
    # 5 -> 1 -> 2: vertex 5 has no in-edges, so its score is 0 after
    # one round; vertex 1's feeds only from 5, so it dies at round 2.
    e = spark.createDataFrame([(5, 1), (1, 2)], "src long, dst long")
    got = {
        r["vid"]: r["eig_scaled"]
        for r in eigenvector_centrality(
            spark, e, cfg=_cfg(), fixed_iterations=2
        ).collect()
    }
    assert got[5] == 0 and got[1] == 0 and got[2] == 1_000_000


def test_l1_normalization(spark):
    e = spark.createDataFrame([(1, 2), (2, 1), (1, 3)],
                              "src long, dst long")
    rows = eigenvector_centrality(
        spark, e, cfg=_cfg(), fixed_iterations=2
    ).collect()
    tot_scaled = sum(r["eig_scaled"] for r in rows)
    for r in rows:
        assert r["eig"] == r["eig_scaled"] / tot_scaled
