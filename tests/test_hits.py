from __future__ import annotations

import numpy as np
import pytest

from crgp_spark.config import EngineConfig
from crgp_spark.operators.hits import hits
from tests.oracles import random_edges


def _cfg(tmp_path):
    return EngineConfig(
        graph_partitions=4, shuffle_partitions=8, checkpoint_dir=str(tmp_path)
    )


def hits_oracle(pdf, iters: int):
    """Integer HITS recurrence + final L1 normalization in numpy."""
    nodes = np.unique(np.concatenate([pdf["src"], pdf["dst"]]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    si = np.array([idx[int(v)] for v in pdf["src"]])
    di = np.array([idx[int(v)] for v in pdf["dst"]])
    h = np.ones(len(nodes), dtype=np.int64)
    a = np.zeros(len(nodes), dtype=np.int64)
    for _ in range(iters):
        a = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(a, di, h[si])
        h = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(h, si, a[di])
    th, ta = h.sum(), a.sum()
    hub = h / th if th else np.zeros(len(nodes))
    auth = a / ta if ta else np.zeros(len(nodes))
    return {int(v): (hub[i], auth[i]) for v, i in idx.items()}


@pytest.mark.parametrize("seed,n,m,it", [(1, 80, 150, 2), (2, 200, 500, 3)])
def test_matches_numpy(spark, tmp_path, seed, n, m, it):
    pdf = random_edges(n, m, seed=seed)
    edges = spark.createDataFrame(pdf)
    got = {
        r.vid: (r.hub, r.auth)
        for r in hits(
            spark, edges, _cfg(tmp_path / str(seed)), fixed_iterations=it
        ).collect()
    }
    want = hits_oracle(pdf, it)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-12)
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-12)


def test_star_graph(spark, tmp_path):
    """u -> {v1..v5}: u is the only hub, targets are equal authorities."""
    import pandas as pd

    pdf = pd.DataFrame({"src": [0] * 5, "dst": [1, 2, 3, 4, 5]})
    got = {
        r.vid: (r.hub, r.auth)
        for r in hits(spark, spark.createDataFrame(pdf), _cfg(tmp_path)).collect()
    }
    assert got[0] == (1.0, 0.0)
    for v in range(1, 6):
        assert got[v] == (0.0, pytest.approx(0.2))
