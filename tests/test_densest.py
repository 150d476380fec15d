"""BKV densest-subgraph peeling: planted-clique recovery + curve laws."""

from __future__ import annotations

from crgp_spark.config import EngineConfig
from crgp_spark.operators.densest import densest_curve, densest_vertices


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_densest")


def _graph():
    # K8 clique on 100..107 (density 3.5) + a 40-vertex path (density
    # ~1) + a bridge from the path into the clique
    clique = [(100 + i, 100 + j) for i in range(8) for j in range(i + 1, 8)]
    path = [(i, i + 1) for i in range(40)]
    return clique + path + [(40, 100)]


def test_peel_recovers_planted_clique(spark):
    df = spark.createDataFrame(_graph(), "src long, dst long")
    got = sorted(
        r["vid"]
        for r in densest_vertices(spark, df, rounds=16, cfg=_cfg()).collect()
    )
    assert got == list(range(100, 108))


def test_curve_is_monotone_and_drains(spark):
    df = spark.createDataFrame(_graph(), "src long, dst long")
    rows = sorted(
        densest_curve(spark, df, rounds=16, cfg=_cfg()).collect(),
        key=lambda r: r["rnd"],
    )
    assert rows[0]["n_verts"] == 49 and rows[0]["n_edges"] == 69
    for a, b in zip(rows, rows[1:]):
        assert b["n_verts"] <= a["n_verts"] and b["n_edges"] <= a["n_edges"]
    assert rows[-1]["n_verts"] == 0  # 16 rounds drain 49 vertices
    # 4-approx guarantee: best observed density >= optimum / 4
    best = max(r["n_edges"] / r["n_verts"] for r in rows if r["n_verts"])
    assert best >= 3.5 / 4
    # and here peeling actually isolates the clique exactly
    assert best == 3.5


def test_empty_and_selfloop_graphs(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    rows = densest_curve(spark, df, rounds=4, cfg=_cfg()).collect()
    assert all(r["n_verts"] == 0 and r["n_edges"] == 0 for r in rows)
    assert densest_vertices(spark, df, rounds=4, cfg=_cfg()).count() == 0
