"""katz: exact fixed-point recurrence vs a numpy oracle, hand-checked
path graph, parameter validation."""

from __future__ import annotations

import numpy as np
import pytest

from crgp_spark.config import EngineConfig
from crgp_spark.operators.katz import katz
from tests.oracles import random_edges


def _cfg(tmp_path):
    return EngineConfig(
        graph_partitions=4, shuffle_partitions=8, checkpoint_dir=str(tmp_path)
    )


def katz_oracle(pdf, iters: int, d: int, s: int):
    """x <- s + (A^T x) // d in int64, then L1-normalize."""
    nodes = np.unique(np.concatenate([pdf["src"], pdf["dst"]]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    si = np.array([idx[int(v)] for v in pdf["src"]])
    di = np.array([idx[int(v)] for v in pdf["dst"]])
    x = np.full(len(nodes), s, dtype=np.int64)
    for _ in range(iters):
        m = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(m, di, x[si])
        x = s + m // d
    tot = x.sum()
    return {int(v): (int(x[i]), x[i] / tot) for v, i in idx.items()}


@pytest.mark.parametrize("seed,n,m,it", [(1, 80, 150, 3), (2, 200, 500, 2)])
def test_matches_numpy(spark, tmp_path, seed, n, m, it):
    pdf = random_edges(n, m, seed=seed)
    got = {
        r.vid: (r.katz_scaled, r.katz)
        for r in katz(
            spark,
            spark.createDataFrame(pdf),
            _cfg(tmp_path / str(seed)),
            fixed_iterations=it,
        ).collect()
    }
    want = katz_oracle(pdf, it, d=4, s=1_000_000)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == want[v][0]  # scaled score exact
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-12)


def test_path_graph_hand_values(spark, tmp_path):
    # a->b->c, S=1e6, D=4, 2 rounds:
    #   x1 = (a: S, b: S+S//4, c: S+S//4)
    #   x2 = (a: S, b: S+S//4, c: S+(S+S//4)//4) = (1e6, 1.25e6, 1312500)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    got = {
        r.vid: r.katz_scaled
        for r in katz(
            spark, edges, _cfg(tmp_path), fixed_iterations=2
        ).collect()
    }
    assert got == {1: 1_000_000, 2: 1_250_000, 3: 1_312_500}


def test_rejects_bad_params(spark, tmp_path):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        katz(spark, edges, _cfg(tmp_path), damp_den=1)
    with pytest.raises(ValueError):
        katz(spark, edges, _cfg(tmp_path), fixed_iterations=0)
