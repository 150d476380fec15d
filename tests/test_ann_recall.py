"""ann_recall: intersection counting, zero-recall queries kept,
self-recall == 1."""

from __future__ import annotations

import pytest

from crgp_spark.operators.similarity import ann_recall, knn_bruteforce


def _topk(spark, rows):
    return spark.createDataFrame(rows, "query_id long, neighbor_id long")


def test_counts_and_zero_kept(spark):
    exact = _topk(spark, [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30), (3, 31)])
    approx = _topk(spark, [(1, 10), (1, 99), (2, 21), (2, 20), (4, 40)])
    got = {
        r["query_id"]: (r["n_hit"], r["recall"])
        for r in ann_recall(exact, approx, k=2).collect()
    }
    # query 3 has zero hits but stays; approx-only query 4 is ignored
    assert got == {1: (1, 0.5), 2: (2, 1.0), 3: (0, 0.0)}


def test_self_recall_is_one(spark):
    import random

    rng = random.Random(2)
    emb = spark.createDataFrame(
        [
            (i, [rng.uniform(-0.5, 0.5) for _ in range(8)])
            for i in range(40)
        ],
        "vec_id long, embedding array<float>",
    )
    topk = knn_bruteforce(emb, emb.filter("vec_id < 5"), k=3)
    rows = ann_recall(topk, topk, k=3).collect()
    assert len(rows) == 5
    assert all(r["recall"] == 1.0 and r["n_hit"] == 3 for r in rows)


def test_bad_k_raises(spark):
    df = _topk(spark, [(1, 2)])
    with pytest.raises(ValueError, match="k must be"):
        ann_recall(df, df, k=0)
