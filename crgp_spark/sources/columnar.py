"""Columnar source/sink beyond parquet: ORC, Spark-native.

The reference reads tar/JSON and writes CSV (tar.rs, get.rs,
write.rs); a Spark deployment additionally meets ORC-resident
warehouses (Hive-era lakes).  Spark's ORC reader has the same
pushdown surface as parquet — predicate pushdown, column pruning and
partition-directory pruning all apply, which is what the
`orc_roundtrip` driver entry and EXPLAIN section certify.

TIMESTAMP_NTZ caveat (same class as the CLAUDE.md parquet rule): the
driver feeds carry NTZ timestamps; convert through
``functions.ts_micros`` BEFORE the sink so the round-trip is
engine-exact integers, not session-zone-dependent timestamps.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_orc", "read_orc"]


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ORC, optionally hive-partitioned (directory per
    partition value — the layout partition pruning reads)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC table (partition columns recovered from the
    directory layout, pushdown available exactly as with parquet)."""
    return spark.read.orc(path)
