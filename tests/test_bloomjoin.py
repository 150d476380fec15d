from __future__ import annotations

from pyspark.sql import functions as F

from crgp_spark.operators.bloomjoin import (
    bloom_filter_table,
    bloom_prefilter,
    bloom_semi_join,
)


def _probe(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 13).alias("payload")
    )


def _build(spark):
    # selective build side: multiples of 17 under 500, plus misses
    return spark.createDataFrame(
        [(i,) for i in range(0, 500, 17)] + [(9999,), (None,)], "bk: long"
    )


def test_exact_semi_join_matches_plain(spark):
    probe, build = _probe(spark), _build(spark)
    got = bloom_semi_join(probe, build, "k", "bk")
    want = probe.join(
        build.select(F.col("bk").alias("k")).where(F.col("k").isNotNull()),
        "k",
        "left_semi",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_exact_despite_tiny_filter(spark):
    """A 64-bit filter is saturated with false positives; the final
    exact join must still return exactly the true matches."""
    probe, build = _probe(spark), _build(spark)
    got = bloom_semi_join(probe, build, "k", "bk", m_bits=64, n_hashes=2)
    want = probe.join(
        build.select(F.col("bk").alias("k")).where(F.col("k").isNotNull()),
        "k",
        "left_semi",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_prefilter_is_superset_and_selective(spark):
    probe, build = _probe(spark), _build(spark)
    cand = bloom_semi_join(probe, build, "k", "bk", exact=False)
    cand_keys = {r["k"] for r in cand.select("k").collect()}
    true_keys = set(range(0, 500, 17))
    assert true_keys <= cand_keys  # no false negatives, ever
    # 2^17 bits for ~30 keys: false positives should be essentially nil
    assert len(cand_keys) <= len(true_keys) + 5


def test_filter_table_shape(spark):
    words = bloom_filter_table(_build(spark), "bk", m_bits=1 << 10)
    rows = words.collect()
    assert all(0 <= r["word_idx"] < (1 << 10) // 64 for r in rows)
    # 30 keys * 4 hashes = <=120 set bits across <=16 words
    assert 1 <= len(rows) <= 16


def test_filter_is_mergeable(spark):
    """bit_or of two halves' word tables == the whole's word table —
    the same monoid property as kmv_merge."""
    build = _build(spark).where(F.col("bk").isNotNull())
    a = build.where(F.col("bk") < 200)
    b = build.where(F.col("bk") >= 200)
    merged = (
        bloom_filter_table(a, "bk")
        .unionByName(bloom_filter_table(b, "bk"))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    whole = bloom_filter_table(build, "bk")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_sizing_validation(spark):
    import pytest

    probe, build = _probe(spark), _build(spark)
    with pytest.raises(ValueError):
        bloom_semi_join(probe, build, "k", "bk", m_bits=100)
    with pytest.raises(ValueError):
        bloom_semi_join(probe, build, "k", "bk", n_hashes=0)
