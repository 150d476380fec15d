"""SparkSession factory.

One place configures every session: AQE (runtime broadcast conversion +
skew-join splitting — the built-in replacement for the reference's manual
GALE/LEAF plan choice and its adaptive probe-side selection,
``reconstruct.rs:79-113``), Arrow transfer for the pandas-UDF kernels, and
shuffle partitioning sized to the machine instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crgp_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``cpus`` controls ``local[N]``; defaults to ``$SPARK_GRAFT_CPUS`` or 32.
    ``master`` overrides entirely — e.g. ``local-cluster[8,4,8192]``
    spawns 8 SEPARATE executor JVMs with 4 cores each, the in-sandbox
    model of a multi-executor cluster (used for the N-vs-4N scaling
    evidence). On a real cluster this module is bypassed by
    ``spark-submit`` conf, but every default below is cluster-safe.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Keep AQE's post-shuffle coalescing from collapsing mid-size
        # iterative state to a handful of partitions (the 64 MB default
        # advisory turns a 150 MB superstep shuffle into ~3 tasks and
        # everything downstream inherits that parallelism). 8 MB keeps
        # partition count ~= configured parallelism at bench scale while
        # still coalescing truly tiny shuffles.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
