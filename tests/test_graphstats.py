from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crgp_spark.config import EngineConfig
from crgp_spark.operators.graphstats import clustering_coefficient, degree_histogram
from crgp_spark.operators.pagerank import personalized_pagerank
from tests.oracles import random_edges


def _cfg(tmp_path):
    return EngineConfig(
        graph_partitions=4, shuffle_partitions=8, checkpoint_dir=str(tmp_path)
    )


def test_degree_histogram(spark):
    pdf = pd.DataFrame({"src": [1, 1, 1, 2, 2, 3], "dst": [2, 3, 4, 3, 4, 4]})
    got = {
        r.out_deg: r.n_vertices
        for r in degree_histogram(spark.createDataFrame(pdf)).collect()
    }
    # out-degrees: 1->3, 2->2, 3->1, 4->0
    assert got == {3: 1, 2: 1, 1: 1, 0: 1}


def test_clustering_triangle_plus_tail(spark, tmp_path):
    """K3 with a pendant vertex: the apex of the tail has coeff 1/3."""
    pdf = pd.DataFrame({"src": [1, 2, 1, 3], "dst": [2, 3, 3, 4]})
    got = {
        r.vid: (r.degree, r.triangles, r.coeff)
        for r in clustering_coefficient(
            spark, spark.createDataFrame(pdf)
        ).collect()
    }
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert got[4] == (1, 0, 0.0)


def ppr_oracle(pdf, sources, alpha, iters):
    nodes = np.unique(np.concatenate([pdf["src"], pdf["dst"]]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    si = np.array([idx[int(v)] for v in pdf["src"]])
    di = np.array([idx[int(v)] for v in pdf["dst"]])
    deg = np.bincount(si, minlength=len(nodes)).astype(float)
    is_src = np.array([int(v) in sources for v in nodes], dtype=float)
    s = is_src.sum()
    r = is_src / s
    for _ in range(iters):
        dang = r[deg == 0].sum()
        contrib = np.zeros(len(nodes))
        np.add.at(contrib, di, np.where(deg[si] > 0, r[si] / deg[si], 0.0))
        r = is_src * ((1 - alpha) / s + alpha * dang / s) + alpha * contrib
    return {int(v): r[i] for v, i in idx.items()}


def test_ppr_matches_numpy(spark, tmp_path):
    pdf = random_edges(150, 300, seed=5)
    srcs = {int(pdf["src"].iloc[0]), int(pdf["src"].iloc[7])}
    got = {
        r.vid: r.rank
        for r in personalized_pagerank(
            spark,
            spark.createDataFrame(pdf),
            spark.createDataFrame(pd.DataFrame({"vid": sorted(srcs)})),
            _cfg(tmp_path),
            fixed_iterations=3,
        ).collect()
    }
    want = ppr_oracle(pdf, srcs, 0.85, 3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_ppr_mass_concentrates_on_sources(spark, tmp_path):
    """With no out-edges from the source's reach, rank stays near it."""
    pdf = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
    got = {
        r.vid: r.rank
        for r in personalized_pagerank(
            spark,
            spark.createDataFrame(pdf),
            spark.createDataFrame(pd.DataFrame({"vid": [1]})),
            _cfg(tmp_path),
            fixed_iterations=3,
        ).collect()
    }
    assert got[1] > got[2] > 0
    assert got[3] > 0
    # a vertex outside the source's forward reach gets rank only via
    # teleport, which is source-restricted: nothing flows backwards
    pdf2 = pd.DataFrame({"src": [1, 9], "dst": [2, 1]})
    got2 = {
        r.vid: r.rank
        for r in personalized_pagerank(
            spark,
            spark.createDataFrame(pdf2),
            spark.createDataFrame(pd.DataFrame({"vid": [1]})),
            _cfg(tmp_path / "b"),
            fixed_iterations=3,
        ).collect()
    }
    assert got2[9] == 0.0


def test_ppr_requires_source_in_graph(spark, tmp_path):
    pdf = pd.DataFrame({"src": [1], "dst": [2]})
    with pytest.raises(ValueError):
        personalized_pagerank(
            spark,
            spark.createDataFrame(pdf),
            spark.createDataFrame(pd.DataFrame({"vid": [99]})),
            _cfg(tmp_path),
        )


def test_graph_summary_star(spark):
    """Star K1,3: assortativity is exactly -1; density 6/(4·3) = 0.5."""
    from crgp_spark.operators.graphstats import graph_summary

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (3, 0)], "src long, dst long"
    )
    r = graph_summary(e).collect()[0]
    assert (
        r["n_vertices"],
        r["n_edges"],
        r["max_deg"],
        r["density"],
        r["avg_deg"],
        r["assortativity"],
    ) == (4, 3, 3, 0.5, 1.5, -1.0)
