"""Zone maps: file-level min/max statistics + data-skipping scans.

Parquet row-group statistics already serve predicate pushdown WITHIN a
file; what lakehouse table formats add at 100 TB is the level above —
per-FILE min/max kept in manifests so a selective scan never opens
non-qualifying files at all (Iceberg manifests, Delta file stats).
This module is that layer over plain parquet directories, composing
with `layout.py`'s z-order keys and `compaction.py`'s rewrites (a
clustered layout is what makes zone maps selective: sort or
range-partition on the predicate column and the per-file ranges become
disjoint).

- ``zone_maps``: ONE distributed pass — group by ``input_file_name()``
  (a JVM expression, scan-speed), min/max/count per file.  The result
  is metadata-sized: one row per file.
- ``skipping_scan``: prune the file list driver-side against the
  predicate interval (an O(files) metadata decision, the same work a
  manifest read does), then scan ONLY the surviving files with the
  residual filter still applied (zone pruning is conservative, the
  filter stays exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zone_maps(spark: SparkSession, path: str, col: str) -> DataFrame:
    """Per-file statistics for ``col``: ``(file, cmin, cmax, n_rows)``."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(col).alias("cmin"),
            F.max(col).alias("cmax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def skipping_scan(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    maps: DataFrame | None = None,
) -> DataFrame:
    """Scan ``path`` for ``lo <= col <= hi`` reading only files whose
    zone ``[cmin, cmax]`` intersects ``[lo, hi]``.  ``maps`` may be a
    precomputed/persisted `zone_maps` result (the manifest read);
    omitted, it is computed first (one extra pass — a real deployment
    amortizes it across queries, as table formats do)."""
    if lo > hi:
        raise ValueError(f"empty interval: lo={lo} > hi={hi}")
    m = maps if maps is not None else zone_maps(spark, path, col)
    keep = [
        r["file"]
        for r in m.filter(
            (F.col("cmax") >= lo) & (F.col("cmin") <= hi)
        ).collect()  # O(files) metadata, the manifest-pruning step
    ]
    pred = (F.col(col) >= lo) & (F.col(col) <= hi)
    if not keep:
        return spark.read.parquet(path).filter(pred).limit(0)
    return spark.read.parquet(*keep).filter(pred)
