"""Link prediction: exact hand-computed scores on tiny graphs."""

from __future__ import annotations

import math

from crgp_spark.operators.linkpred import link_prediction, top_predicted_links


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_linkpred_exact_scores(spark):
    # a(=1) and b(=2) share neighbors z1(=10), z2(=11); no a-b edge.
    e = _edges(spark, [(1, 10), (1, 11), (2, 10), (2, 11)])
    rows = link_prediction(e, min_common=2).collect()
    # 1-2 via {10,11} AND 10-11 via {1,2} are both unconnected pairs
    got = {(r["a"], r["b"]): r for r in rows}
    assert set(got) == {(1, 2), (10, 11)}
    r = got[(1, 2)]
    assert r["common"] == 2
    assert r["jaccard"] == 1.0  # N(1)=N(2)={10,11}
    aa = 2.0 / math.log(2.0)  # both shared neighbors have degree 2
    assert abs(r["adamic_adar"] - aa) < 1e-6


def test_linkpred_excludes_existing_edges(spark):
    # same wedge structure plus the 1-2 edge itself -> pair suppressed
    e = _edges(spark, [(1, 10), (1, 11), (2, 10), (2, 11), (1, 2)])
    got = {(r["a"], r["b"]) for r in link_prediction(e, min_common=2).collect()}
    assert (1, 2) not in got


def test_linkpred_direction_and_duplicates_ignored(spark):
    # reversed/duplicate edges collapse to the same undirected adjacency
    e = _edges(spark, [(10, 1), (1, 11), (11, 1), (2, 10), (10, 2), (2, 11)])
    got = {(r["a"], r["b"]): r["common"] for r in
           link_prediction(e, min_common=2).collect()}
    assert got[(1, 2)] == 2


def test_top_predicted_links_ranking(spark):
    # pair (1,2) shares 3 neighbors, pair (3,4) shares 2 -> rk order
    e = _edges(
        spark,
        [(1, 10), (2, 10), (1, 11), (2, 11), (1, 12), (2, 12),
         (3, 20), (4, 20), (3, 21), (4, 21)],
    )
    rows = top_predicted_links(e, k=2, min_common=2).collect()
    assert [(r["rk"], r["a"], r["b"], r["common"]) for r in rows] == [
        (1, 1, 2, 3),
        (2, 3, 4, 2),
    ]


def test_max_degree_prunes_hub_centers(spark):
    # star hub 99 connects 5 leaves; with max_degree=4 the hub cannot
    # be a wedge center, so no pair survives
    e = _edges(spark, [(99, i) for i in range(1, 6)])
    # every leaf pair shares exactly one neighbor (the hub)
    assert link_prediction(e, min_common=1, max_degree=4).count() == 0
    assert link_prediction(e, min_common=1).count() == 10  # 5 choose 2
