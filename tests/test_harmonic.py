"""Bounded harmonic centrality: hand-computed path graph, generic vs
cascade-kernel agreement, forced-residue hybrid."""

from __future__ import annotations

from crgp_spark.config import EngineConfig
from crgp_spark.operators import harmonic as H


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_harm")


def test_path_graph_counts_and_values(spark):
    # undirected path 0-1-2-3-4, radius 3
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {
        r["vid"]: r.asDict()
        for r in H.harmonic_bounded(spark, df, radius=3, cfg=_cfg()).collect()
    }
    # vertex 0: d1={1} d2={2} d3={3}; H = 1 + 1/2 + 1/3 = 11/6
    assert (got[0]["cnt_d1"], got[0]["cnt_d2"], got[0]["cnt_d3"]) == (1, 1, 1)
    assert got[0]["harmonic"] == 11 / 6
    # vertex 2 (center): d1={1,3} d2={0,4}; H = 2 + 1
    assert (got[2]["cnt_d1"], got[2]["cnt_d2"], got[2]["cnt_d3"]) == (2, 2, 0)
    assert got[2]["harmonic"] == 3.0
    # direction of the input edges must not matter
    assert got[4]["harmonic"] == got[0]["harmonic"]


def test_cascade_kernel_matches_generic(spark):
    rows = []
    # conv A: triangle + tail; conv B: star
    for s, d in [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]:
        rows.append((s, d, "cA"))
    for leaf in (11, 12, 13, 14):
        rows.append((10, leaf, "cB"))
    df = spark.createDataFrame(rows, "src long, dst long, conv_id string")
    a = sorted(
        map(tuple, H.cascade_harmonic(spark, df, radius=3, cfg=_cfg()).collect())
    )
    b = sorted(
        map(
            tuple,
            H.harmonic_bounded(
                spark, df.select("src", "dst"), radius=3, cfg=_cfg()
            ).collect(),
        )
    )
    assert a == b


def test_forced_residue_hybrid_exact(spark, monkeypatch):
    monkeypatch.setattr(H, "KERNEL_MAX_VERTICES", 3)
    rows = [(s, d, "big") for s, d in [(0, 1), (1, 2), (2, 3), (3, 0)]]
    rows += [(20, 21, "small"), (21, 22, "small")]
    df = spark.createDataFrame(rows, "src long, dst long, conv_id string")
    a = sorted(
        map(tuple, H.cascade_harmonic(spark, df, radius=2, cfg=_cfg()).collect())
    )
    b = sorted(
        map(
            tuple,
            H.harmonic_bounded(
                spark, df.select("src", "dst"), radius=2, cfg=_cfg()
            ).collect(),
        )
    )
    assert a == b


def test_closeness_path_graph(spark):
    # path 0-1-2-3-4, radius 3, n=5
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {
        r["vid"]: r.asDict()
        for r in H.closeness_bounded(spark, df, radius=3, cfg=_cfg()).collect()
    }
    # v0: levels {1},{2},{3} -> reach 3, totdist 6, C = 9/(4*6)
    assert (got[0]["reach"], got[0]["totdist"]) == (3, 6)
    assert got[0]["closeness"] == 9 / 24
    # v2 (center): {1,3},{0,4} -> reach 4, totdist 6, C = 16/(4*6)
    assert (got[2]["reach"], got[2]["totdist"]) == (4, 6)
    assert got[2]["closeness"] == 16 / 24
    assert got[4]["closeness"] == got[0]["closeness"]


def test_closeness_cascade_matches_generic(spark):
    rows = []
    for c in range(3):
        base = c * 100
        rows += [(f"u{c}", base + 0, base + 1), (f"u{c}", base + 1, base + 2),
                 (f"u{c}", base + 0, base + 3)]
    e = spark.createDataFrame(rows, "conv_id string, src long, dst long")
    got = sorted(
        map(tuple, H.closeness_cascade(spark, e, radius=3,
                                       cfg=_cfg()).collect())
    )
    want = sorted(
        map(tuple, H.closeness_bounded(spark, e.select("src", "dst"),
                                       radius=3, cfg=_cfg()).collect())
    )
    assert got == want and len(got) > 0
