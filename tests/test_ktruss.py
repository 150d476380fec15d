"""k-truss: exact hand graphs, fixpoint vs pinned rounds, direction
robustness."""

from __future__ import annotations

from crgp_spark.operators.ktruss import edge_support, ktruss


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _k4_plus_pendant(spark):
    # K4 on {1,2,3,4}; pendant triangle (1,2,5) hanging off edge (1,2)
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    return _edges(spark, k4 + [(1, 5), (2, 5)])


def test_edge_support_exact(spark):
    und = (
        _k4_plus_pendant(spark)
        .selectExpr("least(src, dst) u", "greatest(src, dst) v")
        .distinct()
    )
    got = {(r["u"], r["v"]): r["support"] for r in edge_support(und).collect()}
    assert got[(1, 2)] == 3  # shared neighbors {3, 4, 5}
    assert got[(3, 4)] == 2  # {1, 2}
    assert got[(1, 5)] == 1 and got[(2, 5)] == 1


def test_ktruss_fixpoint_peels_pendant(spark):
    out = {
        (r["u"], r["v"]): r["support"]
        for r in ktruss(spark, _k4_plus_pendant(spark), k=4).collect()
    }
    # 4-truss = the K4; every surviving edge closes exactly 2 triangles
    assert out == {
        (1, 2): 2, (1, 3): 2, (1, 4): 2, (2, 3): 2, (2, 4): 2, (3, 4): 2
    }


def test_ktruss_pinned_rounds_keeps_round_support(spark):
    out = {
        (r["u"], r["v"]): r["support"]
        for r in ktruss(
            spark, _k4_plus_pendant(spark), k=4, fixed_rounds=1
        ).collect()
    }
    # after ONE round the pendant edges are gone but supports are still
    # the round-1 (pre-peel) values: edge (1,2) counts the (1,2,5)
    # triangle too
    assert out[(1, 2)] == 3 and out[(3, 4)] == 2 and len(out) == 6


def test_ktruss_direction_and_duplicates(spark):
    # reversed duplicates must not change the truss
    e = _edges(spark, [(2, 1), (1, 3), (3, 1), (2, 3), (4, 1), (2, 4), (4, 3)])
    out = ktruss(spark, e, k=4).collect()
    assert len(out) == 6 and all(r["support"] == 2 for r in out)


def test_ktruss_empty_when_k_too_large(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])  # single triangle
    assert ktruss(spark, e, k=4).count() == 0  # needs support >= 2
    assert ktruss(spark, e, k=3).count() == 3  # the triangle itself
