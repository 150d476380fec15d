"""1-WL refinement (operators/wl.py): vertex-transitive graphs stay
monochrome, isomorphic components get identical color multisets,
structurally distinct positions separate."""

from __future__ import annotations

import collections

from crgp_spark.operators.wl import wl_refine


def _colors(spark, pairs, rounds=2):
    df = wl_refine(
        spark, spark.createDataFrame(pairs, "src: long, dst: long"),
        rounds=rounds,
    )
    return {r["vid"]: r["color"] for r in df.collect()}


def test_cycle_is_monochrome(spark):
    c = _colors(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert len(set(c.values())) == 1


def test_path_separates_positions(spark):
    # P4: ends alike, middles alike, ends != middles
    c = _colors(spark, [(1, 2), (2, 3), (3, 4)])
    assert c[1] == c[4] and c[2] == c[3] and c[1] != c[2]


def test_isomorphic_components_match(spark):
    # two disjoint copies of the same 5-vertex graph
    base = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    shifted = [(u + 10, v + 10) for u, v in base]
    c = _colors(spark, base + shifted)
    m1 = collections.Counter(c[v] for v in (1, 2, 3, 4, 5))
    m2 = collections.Counter(c[v + 10] for v in (1, 2, 3, 4, 5))
    assert m1 == m2
    assert c[5] == c[15] and c[3] == c[13]


def test_refines_degree_partition(spark):
    # same-color vertices must share a degree (refinement property)
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (1, 7)]
    c = _colors(spark, pairs)
    deg = collections.Counter()
    for u, v in pairs:
        deg[u] += 1
        deg[v] += 1
    by_color = collections.defaultdict(set)
    for v, col in c.items():
        by_color[col].add(deg[v])
    assert all(len(s) == 1 for s in by_color.values())


def test_star_two_classes(spark):
    c = _colors(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    assert len({c[2], c[3], c[4], c[5]}) == 1
    assert c[1] != c[2]


def test_rounds_zero_is_degree(spark):
    c = _colors(spark, [(1, 2), (2, 3)], rounds=0)
    assert c == {1: 1, 2: 2, 3: 1}
