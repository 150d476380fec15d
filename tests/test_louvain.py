"""Parity-scheduled Louvain: planted-community recovery, exact
contraction weights, multi-level composition, weighted/self-loop path."""

from __future__ import annotations

from crgp_spark.config import EngineConfig
from crgp_spark.operators.louvain import (
    contract_communities,
    louvain,
    louvain_moves,
)


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_louvain")


def _two_cliques():
    # K5 on 0..4 and K5 on 10..14, one bridge edge (4, 10)
    k1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    k2 = [(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)]
    return k1 + k2 + [(4, 10)]


def test_recovers_planted_cliques(spark):
    df = spark.createDataFrame(_two_cliques(), "src long, dst long")
    res = louvain_moves(spark, df, _cfg(), rounds=12)
    comm = {r["vid"]: r["comm"] for r in res.state.collect()}
    assert len(comm) == 10
    c1 = {comm[v] for v in range(5)}
    c2 = {comm[v] for v in range(10, 15)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2


def test_result_modularity_beats_singletons(spark):
    from pyspark.sql import functions as F

    from crgp_spark.operators.graphstats import modularity

    df = spark.createDataFrame(_two_cliques(), "src long, dst long")
    res = louvain_moves(spark, df, _cfg(), rounds=12)
    labels = res.state.select("vid", F.col("comm").alias("label"))
    q = modularity(df, labels).first()["modularity"]
    # planted two-clique partition: Q = 2*(10/21 - (21/42)^2) ≈ 0.452
    assert q > 0.4


def test_contract_exact_weights(spark):
    # two triangles {0,1,2} and {3,4,5} plus bridge (2,3); assign each
    # triangle to one community -> coarse: two 3-weight self-loops and
    # one weight-1 cross edge
    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    df = spark.createDataFrame(tri, "src long, dst long")
    assign = spark.createDataFrame(
        [(v, 0 if v < 3 else 3) for v in range(6)], "vid long, comm long"
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in contract_communities(df, assign).collect()
    }
    assert got == {(0, 0): 3, (3, 3): 3, (0, 3): 1}


def test_weighted_selfloops_enter_degree(spark):
    # supervertex 1 carries a heavy self-loop; its degree must count it
    # twice, making joining it unattractive for 3 despite the w=1 link
    # (score 2W*k - d3*tot(c1) = 2*12*1 - 1*(2+8+... ) stays negative),
    # while 3<->4 (w=2 mutual) merge.
    rows = [(1, 1, 4), (1, 3, 1), (3, 4, 2), (4, 5, 1)]
    df = spark.createDataFrame(rows, "src long, dst long, weight long")
    res = louvain_moves(spark, df, _cfg(), rounds=4, weight_col="weight")
    comm = {r["vid"]: r["comm"] for r in res.state.collect()}
    assert comm[3] == comm[4]
    assert comm[1] != comm[3]


def test_multilevel_composition(spark):
    # ring of 6 triangles: level 1 groups each triangle; level 2 runs on
    # the contracted ring. The composed assignment must cover every
    # original vertex and never split a triangle.
    edges = []
    for t in range(6):
        a, b, c = 3 * t, 3 * t + 1, 3 * t + 2
        edges += [(a, b), (b, c), (a, c)]
        edges.append((c, (3 * (t + 1)) % 18))  # ring link
    df = spark.createDataFrame(edges, "src long, dst long")
    out = louvain(spark, df, _cfg(), levels=2, rounds=6)
    comm = {r["vid"]: r["comm"] for r in out.collect()}
    assert len(comm) == 18
    for t in range(6):
        assert comm[3 * t] == comm[3 * t + 1] == comm[3 * t + 2]
    # determinism: a second run composes to the identical assignment
    out2 = louvain(spark, df, _cfg(), levels=2, rounds=6)
    assert comm == {r["vid"]: r["comm"] for r in out2.collect()}
