"""Banded range join == naive between-join, across band widths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.rangejoin import range_join_banded


@pytest.mark.parametrize("band", [1, 7, 100, 10_000])
def test_banded_equals_naive(spark, band):
    pts = spark.createDataFrame(
        [(i, "k%d" % (i % 3), i * 13 % 997) for i in range(200)],
        "pid long, k string, t long",
    )
    iv = spark.createDataFrame(
        [
            ("k0", 0, 100, "a"), ("k0", 50, 60, "b"), ("k1", 900, 997, "c"),
            ("k2", 0, 996, "d"), ("k2", 500, 400, "empty"),  # inverted: no match
        ],
        "k string, s long, e long, label string",
    )
    # the inverted interval stays in: Spark's sequence() descends for
    # s > e, and the exact containment filter still excludes it
    got = {
        (r["pid"], r["label"])
        for r in range_join_banded(pts, iv, "k", "t", "s", "e", band).collect()
    }
    want = {
        (r["pid"], r["label"])
        for r in pts.join(iv, "k")
        .filter((F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e")))
        .collect()
    }
    assert got == want and got
