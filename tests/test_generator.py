from __future__ import annotations

from pyspark.sql import functions as F

from crgp_spark.generator import synthetic_transcripts


def test_deterministic_across_runs(spark):
    a = synthetic_transcripts(spark, n_convs=50, seed=7).orderBy("conv_id", "turn_idx")
    b = synthetic_transcripts(spark, n_convs=50, seed=7).orderBy("conv_id", "turn_idx")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_shape_invariants(spark):
    t = synthetic_transcripts(spark, n_convs=200, seed=42)
    # (conv_id, turn_idx) unique and dense from 0
    stats = t.groupBy("conv_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("turn_idx").alias("nd"),
        F.min("turn_idx").alias("mn"),
        F.max("turn_idx").alias("mx"),
    )
    bad = stats.filter(
        (F.col("n") != F.col("nd")) | (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
    )
    assert bad.count() == 0
    assert stats.filter(F.col("n") < 2).count() == 0
    # ts strictly increasing within conv
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    viol = t.withColumn("prev", F.lag("ts").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev"))
    )
    assert viol.count() == 0


def test_equal_ts_variant_has_ties(spark):
    t = synthetic_transcripts(spark, n_convs=20, seed=42, equal_ts=True)
    dup = t.groupBy("conv_id", "ts").count().filter(F.col("count") > 1)
    assert dup.count() > 0


def test_heavy_tail(spark):
    t = synthetic_transcripts(spark, n_convs=2000, seed=42, max_turns=512)
    sizes = t.groupBy("conv_id").count()
    mx = sizes.agg(F.max("count")).first()[0]
    avg = sizes.agg(F.avg("count")).first()[0]
    assert mx > 10 * avg  # hub conversations exist
