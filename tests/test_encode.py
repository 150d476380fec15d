from __future__ import annotations

import hashlib

import pytest

from crgp_spark.operators.encode import feature_hash, target_encode_loo


def test_target_encode_loo(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, 20.0),
            ("a", 3, 30.0),
            ("b", 4, 5.0),       # singleton -> NULL
            ("c", 5, 1.0),
            ("c", 6, None),      # NULL target -> NULL te, excluded from peers
        ],
        "cat: string, rid: long, y: double",
    )
    got = {
        r["rid"]: r["te"] for r in target_encode_loo(df, "cat", "y").collect()
    }
    assert got[1] == 25.0  # mean(20, 30)
    assert got[2] == 20.0  # mean(10, 30)
    assert got[3] == 15.0  # mean(10, 20)
    assert got[4] is None  # singleton
    assert got[5] is None  # only non-null peer is itself
    assert got[6] is None  # null target


def test_target_encode_rounding_is_decimal(spark):
    # 1/3-style mean: (10.0 + 10.0) excluded-self over 3 -> .6667 at 4dp
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 1.0), ("a", 3, 0.0)],
        "cat: string, rid: long, y: double",
    )
    got = {r["rid"]: r["te"] for r in target_encode_loo(df, "cat", "y").collect()}
    assert got[3] == 1.0
    assert got[1] == 0.5


def _ref_hash(i, c, v, dim):
    num = int(
        hashlib.md5(f"{i}:{c}={v}".encode()).hexdigest()[:15], 16
    )
    return num % dim, -1 if (num // dim) % 2 else 1


def test_feature_hash_matches_python(spark):
    df = spark.createDataFrame(
        [(1, "click", 7), (2, None, 8)],
        "rid: long, et: string, uid: long",
    )
    got = {
        r["rid"]: (list(r["fh_idx"]), list(r["fh_sign"]))
        for r in feature_hash(df, ["et", "uid"], dim=64).collect()
    }
    i0 = _ref_hash(0, "et", "click", 64)
    i1 = _ref_hash(1, "uid", "7", 64)
    assert got[1] == ([i0[0], i1[0]], [i0[1], i1[1]])
    n0 = _ref_hash(0, "et", "\x00NULL", 64)
    assert got[2][0][0] == n0[0] and got[2][1][0] == n0[1]


def test_feature_hash_validation(spark):
    df = spark.createDataFrame([(1,)], "rid: long")
    with pytest.raises(ValueError):
        feature_hash(df, [])
    with pytest.raises(ValueError):
        feature_hash(df, ["rid"], dim=1)


def test_rank_normalize(spark):
    from crgp_spark.operators.encode import rank_normalize

    df = spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, 20.0),
            ("a", 3, 20.0),   # tie: shares rank 2 -> pr (2-1)/(4-1)
            ("a", 4, 30.0),
            ("a", 5, None),   # null: NULL pr, doesn't shift ranks
            ("b", 6, 5.0),    # singleton -> NULL
        ],
        "g: string, rid: long, v: double",
    )
    got = {r["rid"]: r["pr"] for r in rank_normalize(df, "g", "v").collect()}
    assert got[1] == 0.0
    assert got[2] == got[3] == round(1 / 3, 4)
    assert got[4] == 1.0
    assert got[5] is None
    assert got[6] is None
