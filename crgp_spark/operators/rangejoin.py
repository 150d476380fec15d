"""Banded (bucketed) range join: points → containing intervals.

``points JOIN intervals ON key AND ts BETWEEN start AND end`` is a
range predicate Spark executes as a key-equi-join with a post-filter —
fine when keys are selective, quadratic per key when they are not (and
a full ``CartesianProduct`` when there is no key at all).  The scale
encoding is BANDING: explode each interval into the fixed-width time
buckets it covers, bucket each point once, equi-join on
``(key, bucket)``, then apply the exact containment filter.  Every
stage is a hash join with bounded fan-out (interval length / band + 1
replicas per interval); the band width trades replication against
per-bucket join selectivity — pick it near the median interval length.

This is the same trick the dedup family uses for LSH bands and the
IVF index uses for inverted lists: turn a range/similarity predicate
into an equi-join Catalyst can hash-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_banded(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    band: int,
) -> DataFrame:
    """Inner-join each point row to every interval row of the same
    ``key`` whose ``[start, end]`` (inclusive) contains ``ts``.  All
    three bound columns are integers in the same unit; ``band`` is the
    bucket width in that unit.  Returns points' columns + intervals'
    non-key columns."""
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / band), F.floor(F.col(end) / band)
            )
        ),
    )
    pt = points.withColumn("_b", F.floor(F.col(ts) / band))
    return (
        pt.join(iv, on=[key, "_b"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_b")
    )
