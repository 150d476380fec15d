from __future__ import annotations

import pandas as pd
import pytest

from crgp_spark.operators.triangles import triangles
from tests.oracles import random_edges, triangles_oracle


@pytest.mark.parametrize("seed,n,m,pl", [(31, 60, 300, False), (32, 120, 800, True)])
def test_matches_oracle(spark, seed, n, m, pl):
    pdf = random_edges(n, m, seed=seed, power_law=pl)
    edges = spark.createDataFrame(pdf)
    total, per_v = triangles(spark, edges)
    want_total, want_pv = triangles_oracle(pdf)
    assert total == want_total
    got_pv = {r.vid: r.triangles for r in per_v.collect()}
    assert got_pv == want_pv


def test_known_small_graphs(spark):
    # K4 has 4 triangles, each vertex in 3
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(pd.DataFrame(k4, columns=["src", "dst"]))
    total, per_v = triangles(spark, edges)
    assert total == 4
    assert all(r.triangles == 3 for r in per_v.collect())

    # a square (C4) has none
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    edges = spark.createDataFrame(pd.DataFrame(c4, columns=["src", "dst"]))
    total, per_v = triangles(spark, edges)
    assert total == 0
    assert all(r.triangles == 0 for r in per_v.collect())


def test_duplicate_and_reverse_edges_ignored(spark):
    tri = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2)]
    edges = spark.createDataFrame(pd.DataFrame(tri, columns=["src", "dst"]))
    total, _ = triangles(spark, edges)
    assert total == 1
