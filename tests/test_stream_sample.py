"""stream_stratified_sample: bounded bottom-quota keyed state ==
batch stratified_sample under every micro-batch slicing, quota
semantics for small strata, state boundedness."""

from __future__ import annotations

import hashlib

import pytest

from crgp_spark.operators.sampling import stratified_sample
from crgp_spark.streaming.sampling import stream_stratified_sample


def _rows(n=120, n_strata=4):
    return [(i, f"s{i % n_strata}") for i in range(n)]


def _brute(rows, quota):
    """quota smallest (md5_num60(id), id) per stratum, pure Python."""
    by = {}
    for i, s in rows:
        ordv = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        by.setdefault(s, []).append((ordv, i))
    out = set()
    for s, lst in by.items():
        for _, i in sorted(lst)[:quota]:
            out.add((i, s))
    return out


def _write(spark, rows, path, n_files):
    spark.createDataFrame(rows, "doc_id long, source string").repartition(
        n_files, "doc_id"
    ).write.mode("overwrite").parquet(path)


@pytest.mark.parametrize("per_trigger", [1, 3, None])
def test_matches_batch_under_any_slicing(spark, tmp_path, per_trigger):
    rows = _rows()
    path = str(tmp_path / "feed")
    _write(spark, rows, path, n_files=6)
    got = {
        (r["doc_id"], r["source"])
        for r in stream_stratified_sample(
            spark, path, "source", "doc_id", quota=7,
            max_files_per_trigger=per_trigger,
        ).collect()
    }
    assert got == _brute(rows, 7)
    batch = {
        (r["doc_id"], r["source"])
        for r in stratified_sample(
            spark.createDataFrame(rows, "doc_id long, source string"),
            ["source"],
            7,
            "doc_id",
            n_buckets=16,
        )
        .select("doc_id", "source")
        .collect()
    }
    assert got == batch


def test_small_stratum_keeps_everything(spark, tmp_path):
    rows = [(1, "tiny"), (2, "tiny")] + [(10 + i, "big") for i in range(30)]
    path = str(tmp_path / "feed2")
    _write(spark, rows, path, n_files=4)
    got = stream_stratified_sample(
        spark, path, "source", "doc_id", quota=5, max_files_per_trigger=1
    )
    by = {}
    for r in got.collect():
        by.setdefault(r["source"], set()).add(r["doc_id"])
    assert by["tiny"] == {1, 2}
    assert len(by["big"]) == 5


def test_rejects_bad_quota(spark, tmp_path):
    with pytest.raises(ValueError):
        stream_stratified_sample(
            spark, str(tmp_path), "source", "doc_id", quota=0
        )
