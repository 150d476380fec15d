from __future__ import annotations

import hashlib

import pytest

from crgp_spark.operators.sampling import stratified_sample


def _md5_60(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def _reference(rows, quota):
    """Naive per-stratum sort by (md5_60(key), key), take quota."""
    by_stratum: dict = {}
    for stratum, key in rows:
        by_stratum.setdefault(stratum, []).append(key)
    keep = set()
    for stratum, keys in by_stratum.items():
        for k in sorted(keys, key=lambda k: (_md5_60(k), k))[:quota]:
            keep.add((stratum, k))
    return keep


def _rows(n, n_strata):
    return [(f"s{i % n_strata}", i) for i in range(n)]


@pytest.mark.parametrize("quota,n_buckets", [(7, 256), (25, 16), (1, 4)])
def test_matches_naive_sort(spark, quota, n_buckets):
    """Exact agreement with the full-sort reference — including tiny
    bucket counts where EVERY stratum hits the boundary-ranking path."""
    rows = _rows(300, 3)
    df = spark.createDataFrame(rows, "src string, key long")
    got = {
        (r.src, r.key)
        for r in stratified_sample(
            df, ["src"], quota, "key", n_buckets=n_buckets
        ).collect()
    }
    assert got == _reference(rows, quota)


def test_exact_quota_counts(spark):
    df = spark.createDataFrame(_rows(1000, 4), "src string, key long")
    out = stratified_sample(df, ["src"], 60, "key")
    per = {r.src: r.n for r in out.groupBy("src").count().withColumnRenamed("count", "n").collect()}
    assert per == {f"s{i}": 60 for i in range(4)}


def test_small_stratum_kept_whole(spark):
    """quota above a stratum's size keeps the stratum intact."""
    rows = [("big", i) for i in range(100)] + [("tiny", 1000 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "src string, key long")
    got = {
        (r.src, r.key)
        for r in stratified_sample(df, ["src"], 20, "key").collect()
    }
    assert sum(1 for s, _ in got if s == "tiny") == 5
    assert sum(1 for s, _ in got if s == "big") == 20
    assert got == _reference(rows, 20)


def test_deterministic_rerun(spark):
    df = spark.createDataFrame(_rows(500, 2), "src string, key long")
    a = {(r.src, r.key) for r in stratified_sample(df, ["src"], 30, "key").collect()}
    b = {(r.src, r.key) for r in stratified_sample(df, ["src"], 30, "key").collect()}
    assert a == b and len(a) == 60


def test_validation(spark):
    df = spark.createDataFrame(_rows(10, 1), "src string, key long")
    with pytest.raises(ValueError, match="quota"):
        stratified_sample(df, ["src"], 0, "key")
    with pytest.raises(ValueError, match="power of two"):
        stratified_sample(df, ["src"], 3, "key", n_buckets=100)
