from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.skewjoin import salted_join


def _skewed(spark):
    # 90% of rows share one hot key
    rows = [(7, i) for i in range(180)] + [(k, k * 10) for k in range(20)]
    return spark.createDataFrame(rows, "k: long, payload: long")


def _dim(spark):
    return spark.createDataFrame(
        [(k, f"attr{k}") for k in range(15)] + [(7, "hot")],
        "k: long, attr: string",
    )


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_inner_matches_plain(spark):
    left, right = _skewed(spark), _dim(spark)
    got = salted_join(left, right, "k", n_salts=4)
    want = left.join(right, "k", "inner")
    assert sorted(got.columns) == sorted(want.columns)
    assert _sorted(got.select(*want.columns)) == _sorted(want)


def test_left_matches_plain(spark):
    left, right = _skewed(spark), _dim(spark)
    got = salted_join(left, right, "k", n_salts=4, how="left")
    want = left.join(right, "k", "left")
    assert _sorted(got.select(*want.columns)) == _sorted(want)


def test_duplicate_right_rows_multiply_identically(spark):
    left = _skewed(spark)
    right = _dim(spark).unionAll(_dim(spark))  # dup dim rows: fanout 2
    got = salted_join(left, right, "k", n_salts=3)
    want = left.join(right, "k", "inner")
    assert _sorted(got.select(*want.columns)) == _sorted(want)


def test_salt_spreads_hot_key(spark):
    left = _skewed(spark)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(4)
    ).cast("int")
    n = (
        left.where(F.col("k") == 7)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n >= 3  # hot key lands on several sub-keys


def test_validation(spark):
    left, right = _skewed(spark), _dim(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", n_salts=0)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")


def test_map_columns_and_salt_name_collision(spark):
    from pyspark.sql import functions as F

    left = _skewed(spark).withColumn(
        "props", F.create_map(F.lit("a"), F.col("payload"))
    ).withColumn("_salt", F.lit(99))
    right = _dim(spark)
    got = salted_join(left, right, "k", n_salts=4)
    want = left.join(right, "k", "inner")
    assert "_salt" in got.columns  # user column preserved
    assert got.count() == want.count()
    assert got.where(F.col("_salt") != 99).count() == 0
