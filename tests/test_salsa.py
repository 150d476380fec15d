"""SALSA: hand-computed integer trace on a 3-vertex graph, stochastic
mass-conservation bound, and degree-normalization contrast vs HITS."""

from __future__ import annotations

from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.operators.salsa import salsa


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_salsa")


def test_hand_trace_two_rounds(spark):
    # 1->2, 1->3, 2->3 at S=1000:
    # r1: a(2)=500, a(3)=1500; h(1)=500+750=1250, h(2)=750
    # r2: a(2)=625, a(3)=625+750=1375; h(1)=625+687=1312, h(2)=687
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    got = {
        r["vid"]: r.asDict()
        for r in salsa(spark, e, cfg=_cfg(), fixed_iterations=2,
                       mass_scale=1000).collect()
    }
    assert got[1]["hub_scaled"] == 1312 and got[1]["auth_scaled"] == 0
    assert got[2]["hub_scaled"] == 687 and got[2]["auth_scaled"] == 625
    assert got[3]["hub_scaled"] == 0 and got[3]["auth_scaled"] == 1375
    assert got[2]["auth"] == 625 / 2000 and got[3]["auth"] == 1375 / 2000
    assert got[1]["hub"] == 1312 / 1999


def test_substochastic_mass_bound(spark):
    # total authority mass never exceeds the injected hub mass
    e = spark.createDataFrame(
        [(i, (i * 7 + 3) % 20) for i in range(20) if i != (i * 7 + 3) % 20],
        "src long, dst long",
    )
    out = salsa(spark, e, cfg=_cfg(), fixed_iterations=3, mass_scale=10_000)
    tot = out.agg(
        F.sum("hub_scaled").alias("h"), F.sum("auth_scaled").alias("a"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert 0 < tot["a"] <= tot["n"] * 10_000
    assert 0 <= tot["h"] <= tot["n"] * 10_000


def test_degree_normalization_vs_hits(spark):
    # star hub u0 -> v1..v4 plus chain w1 -> w2: under SALSA the star
    # hub's mass is SPLIT across its out-edges, so each leaf authority
    # equals the chain authority (1000 div 4 * ... per-edge share
    # equality), unlike HITS where raw path counts would differ.
    edges = [(0, i) for i in range(1, 5)] + [(10, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["vid"]: r["auth_scaled"]
        for r in salsa(spark, e, cfg=_cfg(), fixed_iterations=1,
                       mass_scale=1000).collect()
    }
    assert got[1] == got[2] == got[3] == got[4] == 250
    assert got[11] == 1000
