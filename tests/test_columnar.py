"""ORC sink/source (sources/columnar.py): bit-exact round-trip and
partition-directory pruning visible in the physical plan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crgp_spark.sources.columnar import read_orc, write_orc


def test_roundtrip_exact_and_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"t{i % 3}", i * 7, 10**15 + i) for i in range(60)],
        "id: long, part: string, cents: long, us: long",
    )
    path = str(tmp_path / "orc")
    write_orc(df, path, partition_by=["part"])
    # hive layout: one directory per partition value
    assert sorted(
        d for d in os.listdir(path) if d.startswith("part=")
    ) == ["part=t0", "part=t1", "part=t2"]
    back = read_orc(spark, path)
    assert sorted(
        map(tuple, back.select("id", "part", "cents", "us").collect())
    ) == sorted(map(tuple, df.collect()))


def test_partition_pruning_in_plan(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"t{i % 3}") for i in range(30)], "id: long, part: string"
    )
    path = str(tmp_path / "orc")
    write_orc(df, path, partition_by=["part"])
    plan = (
        read_orc(spark, path)
        .filter(F.col("part") == "t1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "t1" in plan
    got = read_orc(spark, path).filter(F.col("part") == "t1").count()
    assert got == 10
