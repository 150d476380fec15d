"""HyperLogLog: accuracy envelope, merge monoid, python cross-check."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from crgp_spark.operators.hll import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
    hll_summary,
)

P, CAP = 6, 40


def _regs(values):
    """Pure-python sketch of an iterable of values."""
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx, hq = h % (1 << P), h >> P
        r = 1
        while r < CAP and not (hq >> (r - 1)) & 1:
            r += 1
        regs[idx] = max(regs.get(idx, 0), r)
    return regs


def test_sketch_matches_python(spark):
    vals = [f"user{i % 97}" for i in range(500)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    got = {
        r["idx"]: r["rank"]
        for r in hll_sketch(df, "g", "v", p=P, cap=CAP).collect()
    }
    assert got == _regs(vals)


def test_estimate_within_hll_error(spark):
    # 64 registers -> relative error ~1.04/sqrt(64) = 13%; allow 3 sigma
    n = 5000
    df = spark.createDataFrame(
        [("g", f"id-{i}") for i in range(n)], "g string, v string"
    )
    row = hll_distinct(df, "g", "v", p=P, cap=CAP).collect()[0]
    est = hll_estimate(row["m"], row["v_zero"], row["raw_est"])
    assert abs(est - n) / n < 0.40


def test_merge_equals_whole(spark):
    rows = [("g", f"id-{i % 211}", i % 2) for i in range(1000)]
    df = spark.createDataFrame(rows, "g string, v string, shard int")
    whole = hll_sketch(df, "g", "v", p=P, cap=CAP)
    a = hll_sketch(df.filter(F.col("shard") == 0), "g", "v", p=P, cap=CAP)
    b = hll_sketch(df.filter(F.col("shard") == 1), "g", "v", p=P, cap=CAP)
    merged = hll_merge(a, b, "g")
    key = lambda d: {(r["g"], r["idx"]): r["rank"] for r in d.collect()}
    assert key(merged) == key(whole)
    # and the summaries (the gated shape) agree too
    s1 = hll_summary(whole, "g", p=P, cap=CAP).collect()[0]
    s2 = hll_summary(merged, "g", p=P, cap=CAP).collect()[0]
    assert (s1["v_zero"], s1["s_scaled"], s1["raw_est"]) == (
        s2["v_zero"], s2["s_scaled"], s2["raw_est"],
    )


def test_small_range_uses_linear_counting(spark):
    df = spark.createDataFrame(
        [("g", f"x{i}") for i in range(10)], "g string, v string"
    )
    row = hll_distinct(df, "g", "v", p=P, cap=CAP).collect()[0]
    est = hll_estimate(row["m"], row["v_zero"], row["raw_est"])
    assert row["v_zero"] >= 54  # at most 10 registers touched
    assert abs(est - 10) <= 3
