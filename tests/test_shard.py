from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.shard import rendezvous_assign


def _ids(spark, n=400):
    return spark.range(n).select(F.col("id").alias("doc"))


def _ref_shard(doc, n):
    best = max(
        (int(hashlib.md5(f"{doc}#{s}".encode()).hexdigest()[:15], 16), s)
        for s in range(n)
    )
    return best[1]


def test_matches_python_reference(spark):
    got = {
        r["doc"]: r["shard"]
        for r in rendezvous_assign(_ids(spark, 50), "doc", 7).collect()
    }
    assert got == {d: _ref_shard(d, 7) for d in range(50)}


def test_roughly_balanced(spark):
    counts = (
        rendezvous_assign(_ids(spark), "doc", 4)
        .groupBy("shard")
        .count()
        .collect()
    )
    by = {r["shard"]: r["count"] for r in counts}
    assert set(by) == {0, 1, 2, 3}
    assert all(50 <= c <= 150 for c in by.values())  # 100 expected


def test_minimal_movement_on_resize(spark):
    a = rendezvous_assign(_ids(spark), "doc", 4).withColumnRenamed(
        "shard", "s4"
    )
    b = rendezvous_assign(_ids(spark), "doc", 5).withColumnRenamed(
        "shard", "s5"
    )
    j = a.join(b, "doc")
    moved = j.where(F.col("s4") != F.col("s5"))
    # movers only ever move TO the new shard, and ~1/5 of rows move
    assert moved.where(F.col("s5") != 4).count() == 0
    n_moved = moved.count()
    assert 40 <= n_moved <= 140  # expected 80 of 400


def test_validation(spark):
    with pytest.raises(ValueError):
        rendezvous_assign(_ids(spark), "doc", 0)
