"""stream_cusum: carry-folded chart == batch cusum_chart, state
crosses micro-batch boundaries, rational threshold parity."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.cusum import cusum_chart
from crgp_spark.streaming.cusum import stream_cusum
from crgp_spark.streaming.scd import write_time_chunks


def _feed(spark, n_keys=4, n_rows=160, seed=7):
    rng = random.Random(seed)
    rows = [
        (f"k{rng.randrange(n_keys)}", i * 10, i, rng.randrange(-5, 12))
        for i in range(n_rows)
    ]
    return spark.createDataFrame(
        rows, "key: string, us: long, event_id: long, x: long"
    )


@pytest.fixture(scope="module")
def charts(spark, tmp_path_factory):
    feed = _feed(spark)
    work = str(tmp_path_factory.mktemp("cusum_stream"))
    write_time_chunks(feed, work, n_chunks=4)
    got = stream_cusum(spark, work, k_num=5, k_den=2, h_num=7, h_den=3)
    want = cusum_chart(
        feed, ["key"], [F.col("us"), "event_id"], F.col("x"),
        k_num=5, k_den=2, h_num=7, h_den=3,
    )
    return got, want


def test_stream_equals_batch(spark, charts):
    got, want = charts
    g = sorted(map(tuple, got.select("key", "rn", "x", "cusum_scaled", "alarm").collect()))
    w = sorted(map(tuple, want.select("key", "rn", "x", "cusum_scaled", "alarm").collect()))
    assert g == w and len(g) == 160


def test_carry_crosses_batches(spark, charts):
    """Some key must carry a NONZERO statistic across a chunk boundary
    (chunks are 40 rows of the global (us, event_id) order): the batch
    chart shows cusum > 0 at a key's last row at-or-before a boundary
    with more rows after it — the stream can only reproduce those later
    values (proven equal above) via the preserved state carry."""
    got, want = charts
    from pyspark.sql import Window

    feed = _feed(spark)
    ranked = feed.withColumn(
        "grn", F.row_number().over(Window.orderBy("us", "event_id"))
    ).withColumn(
        "rn", F.row_number().over(Window.partitionBy("key").orderBy("us", "event_id"))
    )
    cus = {(r["key"], r["rn"]): r["cusum_scaled"] for r in want.collect()}
    max_rn = {}
    for r in ranked.collect():
        max_rn[r["key"]] = max(max_rn.get(r["key"], 0), r["rn"])
    straddles = [
        r
        for r in ranked.where(F.col("grn") <= 40).collect()
        if cus[(r["key"], r["rn"])] > 0 and max_rn[r["key"]] > r["rn"]
    ]
    assert straddles, "no nonzero statistic straddles the first boundary"


def test_rejects_bad_denominators(spark, tmp_path):
    feed = _feed(spark, n_rows=4)
    work = str(tmp_path / "bad")
    write_time_chunks(feed, work, n_chunks=1)
    with pytest.raises(ValueError):
        stream_cusum(spark, work, k_num=1, k_den=0)
