"""Seeded-pair betweenness: hand-computed geodesic counts on small
graphs (diamond = tie-free, path = md5 tie-break reproduced in the
test, double-diamond = multiple shortest paths exercise the sigma DP).
"""

from __future__ import annotations

import hashlib

from crgp_spark.config import EngineConfig
from crgp_spark.operators.betweenness import betweenness_seeded


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4)


def _md5(v: int) -> str:
    return hashlib.md5(str(v).encode()).hexdigest()


def test_diamond_all_pairs_symmetric(spark):
    # 1-2, 1-3, 2-4, 3-4: every vertex's farthest is its unique
    # opposite corner at d=2, so no md5 tie-breaks are involved
    e = _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    got = {
        r["vid"]: (r["n_pairs"], r["paths"])
        for r in betweenness_seeded(
            spark, e, n_seeds=4, radius=4, cfg=_cfg()
        ).collect()
    }
    # pairs (1,4),(4,1) pass through {2,3}; (2,3),(3,2) through {1,4}
    assert got == {1: (2, 2), 2: (2, 2), 3: (2, 2), 4: (2, 2)}


def test_path_graph_with_md5_tiebreak(spark):
    # 1-2-3-4-5; vertex 3's farthest set is {1, 5} at d=2 — the
    # operator breaks the tie by smaller md5, recomputed here
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    t3 = 1 if _md5(1) < _md5(5) else 5
    exp_pairs = [(1, 5), (2, 5), (3, t3), (4, 1), (5, 1)]
    interior = {
        (1, 5): [2, 3, 4],
        (2, 5): [3, 4],
        (3, 1): [2],
        (3, 5): [4],
        (4, 1): [2, 3],
        (5, 1): [2, 3, 4],
    }
    exp: dict[int, list[int]] = {}
    for p in exp_pairs:
        for v in interior[p]:
            exp.setdefault(v, []).append(v)
    want = {v: (len(c), len(c)) for v, c in exp.items()}  # 1 path each
    got = {
        r["vid"]: (r["n_pairs"], r["paths"])
        for r in betweenness_seeded(
            spark, e, n_seeds=5, radius=4, cfg=_cfg()
        ).collect()
    }
    assert got == want


def test_multiple_geodesics_counted(spark):
    # 1-2, 1-3, 2-4, 3-4, 4-5: sigma(1,5) = 2, both through vertex 4
    e = _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)])
    got = {
        r["vid"]: (r["n_pairs"], r["paths"])
        for r in betweenness_seeded(
            spark, e, n_seeds=5, radius=4, cfg=_cfg()
        ).collect()
    }
    # whatever the md5-chosen pairs are, the (1,5)/(5,1) geodesics exist
    # (d=3 is the diameter, so farthest-of-1 is 5 and farthest-of-5 is 1)
    assert got[4][1] >= 2  # sigma product 2 via the (1,5) pair alone


def test_sigma_layer_invariant(spark):
    # on any graph: for a pair (s,t), the geodesic count through each
    # interior LAYER sums to sigma(s,t); diamond pair (1,4) has
    # sigma = 2 spread over layer d=1 = {2, 3}
    e = _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    rows = betweenness_seeded(
        spark, e, n_seeds=4, radius=4, cfg=_cfg()
    ).collect()
    # vertices 2 and 3 each carry one of the two 1->4 geodesics (plus
    # one from the reversed pair) — totals already checked above; here
    # assert the counts are balanced, not lumped onto one branch
    paths = {r["vid"]: r["paths"] for r in rows}
    assert paths[2] == paths[3]


def test_isolated_and_single_edge_components(spark):
    # a lone edge has no interior vertices; must not crash or emit rows
    e = _edges(spark, [(10, 11)])
    assert betweenness_seeded(spark, e, n_seeds=4, radius=3, cfg=_cfg()).count() == 0
