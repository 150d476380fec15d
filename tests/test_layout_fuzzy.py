"""Z-order keys (bit-exact against a Python reference interleave) and
edit-distance-1 fuzzy join (complete + sound vs brute force)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from crgp_spark.operators.fuzzy import fuzzy_pairs_ed1
from crgp_spark.operators.layout import zorder_key, zorder_layout


def _interleave(a: int, b: int) -> int:
    a &= (1 << 31) - 1
    b &= (1 << 31) - 1
    z = 0
    for i in range(31):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_reference_bits(spark):
    cases = [(0, 0), (1, 0), (0, 1), (5, 9), (2**31 - 1, 12345),
             (123456789, 2**31 - 1), (2**31 - 1, 2**31 - 1)]
    df = spark.createDataFrame(cases, "a long, b long")
    got = df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r["z"] == _interleave(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_locality(spark):
    # points in the same small (a, b) tile share high bits: bucket of
    # (x, y) and (x+1, y+1) within a 256-tile must agree more often
    # than random pairs — spot-check the canonical property instead:
    # key range of a quadrant is contiguous
    rows = [(a, b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = {(r["a"], r["b"]): r["z"] for r in df.select(
        "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()}
    # quadrant a,b in [0,2) holds exactly z-keys 0..3
    quad = sorted(z[(a, b)] for a in range(2) for b in range(2))
    assert quad == [0, 1, 2, 3]


def test_zorder_layout_buckets(spark):
    df = spark.createDataFrame(
        [(i, i * 3 % 7, i * 5 % 11) for i in range(50)],
        "event_id long, a long, b long",
    )
    out = zorder_layout(df, "a", "b", "event_id", bucket_bits=8).collect()
    assert len(out) == 50
    assert all(0 <= r["bucket"] < 256 for r in out)


def _brute_ed1(words):
    def ed(a, b):
        if a == b:
            return 0
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return 2
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    return {
        (min(a, b), max(a, b))
        for a, b in itertools.combinations(words, 2)
        if ed(a, b) == 1
    }


def test_fuzzy_ed1_complete_and_sound(spark):
    words = ["u1", "u2", "u11", "u12", "cat", "cart", "car", "dog",
             "dig", "spark", "spar", "spars", "x"]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {(r["s1"], r["s2"]) for r in fuzzy_pairs_ed1(df).collect()}
    assert got == _brute_ed1(words)


def test_fuzzy_excludes_identical_and_far(spark):
    df = spark.createDataFrame([("aa",), ("aa",), ("bb",), ("aabb",)], "s string")
    got = {(r["s1"], r["s2"]) for r in fuzzy_pairs_ed1(df).collect()}
    assert got == set()  # ed("aa","bb")=2, ed("aa","aabb")=2
