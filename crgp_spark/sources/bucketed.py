"""Bucketed tables: co-located (exchange-free) equi-joins.

The reference pre-partitions its adjacency by worker once and reuses
that placement every epoch (`reconstruct.rs:49` exchange on first use,
then worker-resident state).  The warehouse equivalent — and the
single biggest join optimization available at 100 TB — is bucketing:
both fact tables are written ONCE with ``bucketBy(n, key)`` +
``sortBy(key)``, and every subsequent equi-join on that key reads
bucket i against bucket i with NO Exchange on either side (the scan
itself satisfies the join's hash-clustering requirement; plans show
``Bucketed: true`` and ``SelectedBucketsCount``).  A nightly 100 TB
fact-to-fact join pays its shuffle at write time, once, instead of at
every query — and a literal equality predicate on the bucket key
prunes to a single bucket at scan time (bucket pruning), the same
free win partition pruning gives dates.

Tables are written as EXTERNAL parquet tables (explicit ``path``), so
placement is an operator choice, not a warehouse-dir default, and the
bucketing metadata lives in the session catalog exactly as Spark's
own bucketing contract requires (plain ``spark.read.parquet`` of the
same files would NOT know the layout — reading through the catalog is
what makes the exchange elision sound).

Pruning caveat: the planner keeps a bucketed scan only when it elides
an exchange; a bare filter query needs
``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` for
single-bucket pruning to show (asserted in `tests/test_bucketed.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Write ``df`` as an external parquet table bucketed AND sorted by
    ``key`` into ``n_buckets`` hash buckets — the pay-once placement
    shuffle."""
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Equi-join two co-bucketed catalog tables with the sort-merge
    strategy pinned (``merge`` hint beats any broadcast threshold), so
    the plan is the bucketed-scan SMJ with zero Exchange nodes — the
    shape `tests/test_bucketed.py` asserts mechanically."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table).hint("merge")
    return left.join(right, F.col(left_key) == F.col(right_key))
