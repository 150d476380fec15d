"""Bucketed co-located joins: the exchange-free plan contract.

Bucketing never changes results — only the plan — so these tests
assert the PLAN properties mechanically (the thing a 100 TB deployment
actually buys): bucketed scans, zero Exchange in the join, and
single-bucket pruning under a literal key predicate.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from crgp_spark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bkt")
    uid = uuid.uuid4().hex[:8]
    lt, rt = f"bkt_l_{uid}", f"bkt_r_{uid}"
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("rk"), (F.col("id") % 3).alias("w")
    )
    write_bucketed(left, lt, str(base / "l"), "k", n_buckets=4)
    write_bucketed(right, rt, str(base / "r"), "rk", n_buckets=4)
    yield lt, rt, left, right
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {rt}")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_join_has_no_exchange_and_bucketed_scans(spark, tables):
    lt, rt, _, _ = tables
    j = colocated_join(spark, lt, rt, "k", "rk")
    plan = _plan(j)
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2


def test_results_equal_plain_join(spark, tables):
    lt, rt, left, right = tables
    j = colocated_join(spark, lt, rt, "k", "rk").select("k", "v", "w")
    plain = left.join(right, F.col("k") == F.col("rk")).select("k", "v", "w")
    assert sorted(map(tuple, j.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_literal_predicate_prunes_to_one_bucket(spark, tables):
    # the planner only keeps a bucketed scan when it elides an
    # exchange; forcing bucketed scans (autoBucketedScan=false) makes
    # the literal-key filter prune to a single bucket
    lt, _, _, _ = tables
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        pruned = spark.table(lt).filter(F.col("k") == 42)
        plan = _plan(pruned)
        assert "SelectedBucketsCount: 1 out of 4" in plan
        assert [r["v"] for r in pruned.collect()] == [42 % 7]
    finally:
        spark.conf.set(key, prev)


def test_validates_bucket_count(spark, tables):
    _, _, left, _ = tables
    with pytest.raises(ValueError):
        write_bucketed(left, "bkt_bad", "/tmp/bkt_bad", "k", n_buckets=0)
