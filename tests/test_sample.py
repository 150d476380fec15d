"""Deterministic sampling: partitioning-independence and exact caps."""

from __future__ import annotations

from crgp_spark.operators.sample import hash_sample, stratified_sample


def test_hash_sample_partitioning_independent(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r["k"] for r in hash_sample(df, "k", 10).collect()}
    b = {r["k"] for r in hash_sample(df.repartition(17), "k", 10).collect()}
    assert a == b and 120 < len(a) < 280  # ~10% +- binomial noise


def test_hash_sample_bands_compose(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    p30 = {r["k"] for r in hash_sample(df, "k", 30).collect()}
    p10 = {r["k"] for r in hash_sample(df, "k", 10).collect()}
    assert p10 <= p30  # hash bands nest


def test_stratified_exact_cap(spark):
    rows = [(i, "t%d" % (i % 3)) for i in range(100)] + [(1000, "rare")]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    out = stratified_sample(df, "event_type", "event_id", 5).collect()
    by = {}
    for r in out:
        by.setdefault(r["event_type"], []).append(r["rk"])
    assert {k: sorted(v) for k, v in by.items()} == {
        "t0": [1, 2, 3, 4, 5],
        "t1": [1, 2, 3, 4, 5],
        "t2": [1, 2, 3, 4, 5],
        "rare": [1],  # smaller stratum keeps what it has
    }
