"""ACL sweep cut: hand-computed conductance curve on two triangles
joined by a bridge — the sweep must find the seed-side triangle."""

from __future__ import annotations

from crgp_spark.operators.sweepcut import sweep_cut


def test_two_triangles_bridge(spark):
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    scores = spark.createDataFrame(
        [(1, 600), (2, 500), (3, 400), (4, 300), (5, 200), (6, 100)],
        "vid long, num long",
    )
    rows = {r["k"]: r.asDict()
            for r in sweep_cut(spark, e, scores, k_max=6).collect()}
    # order by num/deg: 1 (300), 2 (250), 3 (133.3), 4 (100), 5 (100), 6
    assert [rows[k]["vid"] for k in range(1, 7)] == [1, 2, 3, 4, 5, 6]
    assert (rows[1]["vol"], rows[1]["cut"]) == (2, 2)
    assert (rows[2]["vol"], rows[2]["cut"]) == (4, 2)
    assert (rows[3]["vol"], rows[3]["cut"]) == (7, 1)
    assert rows[3]["conductance"] == 1 / 7
    assert (rows[4]["vol"], rows[4]["cut"]) == (10, 2)
    assert rows[4]["conductance"] == 0.5
    assert rows[6]["cut"] == 0 and rows[6]["conductance"] == 0.0
    # the sweep's argmin (excluding the degenerate full graph) is the
    # seed triangle
    best = min((rows[k]["conductance"], k) for k in range(1, 6))
    assert best[1] == 3


def test_k_max_truncates_but_preserves_prefixes(spark):
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    scores = spark.createDataFrame(
        [(1, 600), (2, 500), (3, 400), (4, 300), (5, 200), (6, 100)],
        "vid long, num long",
    )
    full = {r["k"]: r.asDict()
            for r in sweep_cut(spark, e, scores, k_max=6).collect()}
    trunc = {r["k"]: r.asDict()
             for r in sweep_cut(spark, e, scores, k_max=3).collect()}
    assert set(trunc) == {1, 2, 3}
    for k in trunc:
        assert trunc[k] == full[k]
