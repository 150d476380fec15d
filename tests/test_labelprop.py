from __future__ import annotations

import pytest

from crgp_spark.config import EngineConfig
from crgp_spark.operators.labelprop import label_propagation
from tests.oracles import label_propagation_oracle, random_edges


def _cfg(tmp_path):
    return EngineConfig(
        graph_partitions=4, shuffle_partitions=8, checkpoint_dir=str(tmp_path)
    )


@pytest.mark.parametrize("seed,n,m", [(21, 80, 150), (22, 150, 200)])
def test_matches_oracle_fixed_iters(spark, tmp_path, seed, n, m):
    pdf = random_edges(n, m, seed=seed)
    edges = spark.createDataFrame(pdf)
    res = label_propagation(
        spark,
        edges,
        _cfg(tmp_path / str(seed)),
        fixed_iterations=5,
        algo_name=f"lp{seed}",
    )
    got = {r.vid: r.label for r in res.state.collect()}
    want = label_propagation_oracle(pdf, n_iter=5)
    assert got == want


def test_converges_on_disjoint_cliques(spark, tmp_path):
    """Two cliques joined by nothing: every vertex ends with its clique's
    min label."""
    import pandas as pd

    rows = []
    for base in (100, 200):
        ids = [base + i for i in range(6)]
        rows += [(a, b) for a in ids for b in ids if a < b]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))
    res = label_propagation(spark, edges, _cfg(tmp_path), algo_name="lp_cliq")
    assert res.converged
    got = {r.vid: r.label for r in res.state.collect()}
    assert all(lbl == 100 for v, lbl in got.items() if v < 200)
    assert all(lbl == 200 for v, lbl in got.items() if v >= 200)
