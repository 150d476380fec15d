from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.histogram import (
    hist_grouped_quantiles,
    hist_merge,
    hist_quantiles,
    hist_sketch,
)

_BS = [1.0, 2.0, 5.0, 10.0, 100.0]


def _df(spark, rows):
    return spark.createDataFrame(rows, "g: string, v: double")


def test_sketch_buckets(spark):
    df = _df(
        spark,
        [("a", 0.5), ("a", 1.0), ("a", 1.5), ("a", 7.0), ("a", 500.0),
         ("a", None)],
    )
    got = {
        (r["bucket"]): r["n"] for r in hist_sketch(df, "g", "v", _BS).collect()
    }
    # 0.5 and 1.0 -> bucket 0 (v <= 1.0); 1.5 -> 1; 7.0 -> 3; 500 -> overflow 5
    assert got == {0: 2, 1: 1, 3: 1, 5: 1}


def test_quantiles_nearest_rank(spark):
    df = _df(spark, [("a", float(v)) for v in [1, 1, 2, 3, 4, 6, 7, 50, 99]])
    got = {
        r["q"]: (r["n_total"], r["est"])
        for r in hist_grouped_quantiles(
            df, "g", "v", _BS, [0.25, 0.5, 0.9, 1.0]
        ).collect()
    }
    # n=9: rank(0.25)=3 -> value 2 -> bucket upper 2.0
    assert got[0.25] == (9, 2.0)
    # rank(0.5)=5 -> value 4 -> bucket (2,5] upper 5.0
    assert got[0.5] == (9, 5.0)
    # rank(0.9)=9 -> value 99 -> bucket (10,100] upper 100.0
    assert got[0.9] == (9, 100.0)
    assert got[1.0] == (9, 100.0)


def test_overflow_reports_null(spark):
    df = _df(spark, [("a", 1000.0), ("a", 2000.0)])
    got = hist_grouped_quantiles(df, "g", "v", _BS, [0.5]).collect()
    assert got[0]["est"] is None


def test_merge_is_monoid(spark):
    x = _df(spark, [("a", float(v)) for v in range(0, 60)] + [("b", 3.0)])
    y = _df(spark, [("a", float(v)) for v in range(40, 120)] + [("c", 7.0)])
    whole = _df(
        spark,
        [("a", float(v)) for v in range(0, 60)]
        + [("a", float(v)) for v in range(40, 120)]
        + [("b", 3.0), ("c", 7.0)],
    )
    merged = hist_merge(
        hist_sketch(x, "g", "v", _BS), hist_sketch(y, "g", "v", _BS)
    )
    direct = hist_sketch(whole, "g", "v", _BS)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    em = sorted(map(tuple, hist_quantiles(merged, _BS, [0.5, 0.9]).collect()))
    ed = sorted(map(tuple, hist_quantiles(direct, _BS, [0.5, 0.9]).collect()))
    assert em == ed


def test_one_sided_guarantee_vs_exact(spark):
    """est must satisfy P(X <= est) >= q whenever est is non-NULL."""
    import random

    rng = random.Random(7)
    rows = [("g", rng.uniform(0, 150)) for _ in range(500)]
    df = _df(spark, rows)
    vals = sorted(v for _, v in rows)
    for r in hist_grouped_quantiles(
        df, "g", "v", _BS, [0.1, 0.5, 0.99]
    ).collect():
        if r["est"] is not None:
            frac = sum(1 for v in vals if v <= r["est"]) / len(vals)
            assert frac >= r["q"]


def test_validation(spark):
    df = _df(spark, [("a", 1.0)])
    with pytest.raises(ValueError):
        hist_sketch(df, "g", "v", [])
    with pytest.raises(ValueError):
        hist_sketch(df, "g", "v", [2.0, 1.0])
    with pytest.raises(ValueError):
        hist_grouped_quantiles(df, "g", "v", _BS, [0.0])
