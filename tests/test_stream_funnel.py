"""stream_funnel: min-vector state drains to the batch funnel row
under any chunking; order-free (shuffled feed gives the same row)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.cohort import funnel_counts
from crgp_spark.streaming.funnel import stream_funnel
from crgp_spark.streaming.scd import write_time_chunks

STAGES = ("signup", "view", "click", "purchase")


def _events(spark, seed=21, n=400):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(40), rng.choice(STAGES), 1_000 + i * 13, i)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, us long, event_id long"
    )


def test_stream_equals_batch(spark, tmp_path):
    feed = _events(spark)
    work = str(tmp_path / "funnel")
    write_time_chunks(feed, work, n_chunks=4)
    got = stream_funnel(spark, work, STAGES).collect()[0].asDict()
    batch = (
        feed.withColumn("ts", F.timestamp_micros(F.col("us")))
        .select("user_id", "event_type", "ts")
    )
    want = funnel_counts(batch, STAGES).collect()[0].asDict()
    assert got == want
    assert want["n_signup"] > want["n_purchase"] > 0  # funnel narrows


def test_order_free_any_chunking(spark, tmp_path):
    """Shuffle the feed into chunks by hash instead of time: MIN is a
    commutative monoid, so the drained funnel must be identical."""
    feed = _events(spark, seed=5)
    shuffled = feed.withColumn(
        "us2", F.xxhash64("event_id")
    ).select("user_id", "event_type", "us", F.col("us2").alias("event_id"))
    # write_time_chunks orders by (us, event_id); use the hash as a fake
    # clock so chunks interleave stages arbitrarily
    scrambled = shuffled.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("us"),
        F.col("us").alias("event_id"),
    )
    w1, w2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_time_chunks(
        feed.select("user_id", "event_type", "us", "event_id"), w1, 3
    )
    # scrambled file order, but carry the TRUE us in a renamed column —
    # rebuild the real us before streaming
    write_time_chunks(scrambled, w2, 3)
    got1 = stream_funnel(spark, w1, STAGES).collect()[0].asDict()
    sp = spark.read.parquet(w2).select(
        "user_id", "event_type", F.col("event_id").alias("us")
    )
    import os

    w3 = str(tmp_path / "c")
    os.makedirs(w3)
    sp.coalesce(2).write.mode("overwrite").parquet(w3)
    got2 = stream_funnel(spark, w3, STAGES).collect()[0].asDict()
    assert got1 == got2


def test_too_few_stages_raises(spark, tmp_path):
    feed = _events(spark, n=10)
    work = str(tmp_path / "x")
    write_time_chunks(feed, work, n_chunks=1)
    with pytest.raises(ValueError, match="two funnel stages"):
        stream_funnel(spark, work, ("signup",))
