"""Neighborhood feature propagation: hand-computed 2-hop means and
parallel-edge weighting."""

from __future__ import annotations

from crgp_spark.config import EngineConfig
from crgp_spark.operators.featprop import neighborhood_mean


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_fp")


def test_two_hop_means(spark):
    df = spark.createDataFrame([(0, 2), (1, 2), (0, 1)], "src long, dst long")
    got = {
        r["vid"]: (r["f0"], r["f1"], r["f2"])
        for r in neighborhood_mean(spark, df, hops=2, cfg=_cfg()).collect()
    }
    # f0 = out-degree; f1 = mean f0 of in-edge sources; f2 likewise on f1
    assert got[0] == (2.0, 0.0, 0.0)          # no in-edges
    assert got[1] == (1.0, 2.0, 0.0)          # <-0 (f0=2), then f1(0)=0
    assert got[2] == (0.0, 1.5, 1.0)          # mean(2,1); mean(0,2)
    assert len(got) == 3


def test_parallel_edges_weight_the_source(spark):
    df = spark.createDataFrame(
        [(0, 2), (0, 2), (1, 2)], "src long, dst long"
    )
    got = {
        r["vid"]: r["f1"]
        for r in neighborhood_mean(spark, df, hops=1, cfg=_cfg()).collect()
    }
    # three in-EDGES: (2 + 2 + 1)/3 quantized at 1e-6
    assert got[2] == 1.666667


def test_neighbor_sample_deterministic_and_capped(spark):
    import hashlib

    from crgp_spark.operators.featprop import neighbor_sample

    edges = [(0, d) for d in range(10)] + [(1, 5), (2, 6), (2, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = neighbor_sample(df, fanout=3).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append((r["rk"], r["dst"]))
    # capped at fanout, low-degree vertices keep everything
    assert len(by_src[0]) == 3 and len(by_src[1]) == 1 and len(by_src[2]) == 2
    # the kept set is the hash-smallest prefix, rank order matching
    want = sorted(
        range(10),
        key=lambda d: hashlib.md5(f"0:{d}".encode()).hexdigest(),
    )[:3]
    assert [d for _, d in sorted(by_src[0])] == want
