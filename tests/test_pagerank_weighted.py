"""Weighted PageRank (pagerank_df weight_col): numpy cross-check and
weight-1 equivalence."""

from __future__ import annotations

import numpy as np

from crgp_spark.config import EngineConfig
from crgp_spark.operators.pagerank import pagerank_df


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4,
                        checkpoint_dir="/tmp/crgp_ckpt_wpr")


def _numpy_wpr(n, wedges, iters, alpha=0.85):
    r = np.full(n, 1.0 / n)
    out_w = np.zeros(n)
    for s, _, w in wedges:
        out_w[s] += w
    for _ in range(iters):
        nxt = np.full(n, (1.0 - alpha) / n)
        dang = r[out_w == 0].sum()
        for s, d, w in wedges:
            nxt[d] += alpha * r[s] * w / out_w[s]
        nxt += alpha * dang / n
        r = nxt
    return r


def test_weighted_matches_numpy(spark):
    # 0 ->(3) 1, 0 ->(1) 2, 1 ->(2) 2; vertex 2 dangling
    wedges = [(0, 1, 3), (0, 2, 1), (1, 2, 2)]
    df = spark.createDataFrame(wedges, "src long, dst long, w long")
    got = {
        r["vid"]: r["rank"]
        for r in pagerank_df(
            spark, df, _cfg(), fixed_iterations=4, weight_col="w"
        ).collect()
    }
    want = _numpy_wpr(3, wedges, iters=4)
    for v in range(3):
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])


def test_weight_one_equals_unweighted(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    dfw = df.selectExpr("src", "dst", "CAST(1 AS LONG) AS w")
    a = {
        r["vid"]: r["rank"]
        for r in pagerank_df(spark, df, _cfg(), fixed_iterations=3).collect()
    }
    b = {
        r["vid"]: r["rank"]
        for r in pagerank_df(
            spark, dfw, _cfg(), fixed_iterations=3, weight_col="w"
        ).collect()
    }
    assert a == b


def test_nonpositive_weights_fail_loudly(spark):
    """ADVICE r3: zero/negative/NULL weights must raise, not silently
    leak rank mass through a 0 out-degree."""
    import pytest

    from crgp_spark.operators.pagerank import pagerank_df

    for w in (0, -2, None):
        edges = spark.createDataFrame(
            [(1, 2, 3), (2, 1, w)], "src long, dst long, w long"
        )
        with pytest.raises(ValueError, match="weight > 0"):
            pagerank_df(spark, edges, fixed_iterations=2, weight_col="w")
