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


def _mixing_reference(edges):
    """Python reference for mixing_stats: exact fractions via floats on
    exact integer moments (same final-ops contract as the engine)."""
    import math

    e = {(u, v) for u, v in edges if u != v}
    m = len(e)
    mutual = sum(1 for u, v in e if (v, u) in e)
    dout, din = {}, {}
    for u, v in e:
        dout[u] = dout.get(u, 0) + 1
        din[v] = din.get(v, 0) + 1
    xs = [(dout[u], din[v]) for u, v in e]
    sx = sum(x for x, _ in xs)
    sy = sum(y for _, y in xs)
    sxx = sum(x * x for x, _ in xs)
    syy = sum(y * y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    num = m * sxy - sx * sy
    den = math.sqrt(float(m * sxx - sx * sx) * float(m * syy - sy * sy))
    import math as _m

    def rnd(x):
        return _m.floor(x * 10**6 + 0.5) / 10**6

    assort = rnd(num / den) if den > 0 else None
    return m, mutual, rnd(mutual / m), assort


def test_mixing_stats_hand_graph(spark):
    """2-cycle + chain: reciprocity = 2/5; assortativity vs reference."""
    from crgp_spark.operators.graphstats import mixing_stats

    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 4)]
    r = mixing_stats(
        spark.createDataFrame(edges, "src long, dst long")
    ).collect()[0]
    m, mutual, recip, assort = _mixing_reference(edges)
    assert (r["n_edges"], r["n_mutual"], r["reciprocity"]) == (m, mutual, recip)
    assert r["assortativity"] == assort


def test_mixing_stats_constant_degree_null(spark):
    """A directed ring has constant (1,1) degrees: zero variance ->
    NULL assortativity, reciprocity 0."""
    from crgp_spark.operators.graphstats import mixing_stats

    edges = [(i, (i + 1) % 5) for i in range(5)]
    r = mixing_stats(
        spark.createDataFrame(edges, "src long, dst long")
    ).collect()[0]
    assert r["reciprocity"] == 0.0 and r["assortativity"] is None


def test_mixing_stats_random_matches_reference(spark):
    from crgp_spark.operators.graphstats import mixing_stats
    import hashlib

    def h(*xs):
        return int(hashlib.md5(":".join(map(str, xs)).encode()).hexdigest()[:8], 16)

    edges = [(h(9, i, "u") % 30, h(9, i, "v") % 30) for i in range(200)]
    edges = [(u, v) for u, v in edges if u != v]
    r = mixing_stats(
        spark.createDataFrame(edges, "src long, dst long")
    ).collect()[0]
    m, mutual, recip, assort = _mixing_reference(edges)
    assert (r["n_edges"], r["n_mutual"], r["reciprocity"], r["assortativity"]) == (
        m, mutual, recip, assort,
    )


def _modularity_reference(edges, labels):
    import math

    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    m = len(und)
    lab = dict(labels)
    intra = sum(1 for u, v in und if lab.get(u, u) == lab.get(v, v))
    dc = {}
    for u, v in und:
        dc[lab.get(u, u)] = dc.get(lab.get(u, u), 0) + 1
        dc[lab.get(v, v)] = dc.get(lab.get(v, v), 0) + 1
    sum_dc2 = sum(d * d for d in dc.values())
    qn = 4 * m * intra - sum_dc2
    qd = 4 * m * m
    return m, intra, qn, qd, math.floor(qn / qd * 10**6 + 0.5) / 10**6


def test_modularity_two_triangles(spark):
    """Two triangles + bridge, perfect partition: Q = 70/196."""
    from crgp_spark.operators.graphstats import modularity

    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)]
    labels = [(i, 100) for i in (0, 1, 2)] + [(i, 200) for i in (3, 4, 5)]
    r = modularity(
        spark.createDataFrame(edges, "src long, dst long"),
        spark.createDataFrame(labels, "vid long, label long"),
    ).collect()[0]
    assert tuple(r) == _modularity_reference(edges, labels)
    assert r["q_num"] == 70 and r["q_den"] == 196


def test_modularity_unlabeled_default_singletons(spark):
    """Vertices absent from labels score as their own community."""
    from crgp_spark.operators.graphstats import modularity

    edges = [(0, 1), (1, 2), (2, 0), (2, 9)]
    labels = [(0, 7), (1, 7), (2, 7)]  # 9 unlabeled
    r = modularity(
        spark.createDataFrame(edges, "src long, dst long"),
        spark.createDataFrame(labels, "vid long, label long"),
    ).collect()[0]
    assert tuple(r) == _modularity_reference(edges, labels)


def test_modularity_hash_partition_reference(spark):
    from crgp_spark.operators.graphstats import modularity
    import hashlib

    def h(*xs):
        return int(hashlib.md5(":".join(map(str, xs)).encode()).hexdigest()[:8], 16)

    edges = [(h(4, i, "u") % 25, h(4, i, "v") % 25) for i in range(120)]
    edges = [(u, v) for u, v in edges if u != v]
    verts = {x for e in edges for x in e}
    labels = [(x, x % 4) for x in verts]
    r = modularity(
        spark.createDataFrame(edges, "src long, dst long"),
        spark.createDataFrame(labels, "vid long, label long"),
    ).collect()[0]
    assert tuple(r) == _modularity_reference(edges, labels)
