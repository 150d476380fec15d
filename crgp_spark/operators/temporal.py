"""Effective-dated (temporal) dimension join.

The consumer side of `scd.scd2_history`: join every fact row to the
dimension version that was ACTIVE at the fact's event time —
``fact.key = dim.key AND fact_us >= valid_from AND (valid_to IS NULL
OR fact_us < valid_to)`` (half-open intervals, so boundary facts take
the newer version).  This is the join every SCD-2 warehouse runs on
every query; getting it wrong (joining to the CURRENT version) is the
classic silent time-travel bug.

Plan shape: one equi-exchange per side on the key; the interval
predicate is a band filter applied inside the join, and versions per
key are few, so fan-out is bounded — the same posture as
`attribution.attribute_conversions`.  Facts with no active version
(before the key's first version, or an unknown key) are kept with
NULL dimension columns (left join) so coverage loss is visible, never
silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts_col: str,
    dim_prefix: str = "dim_",
) -> DataFrame:
    """Join ``facts`` to the SCD2 ``dim`` (the `scd2_history` output:
    ``key_col, attrs..., valid_from, valid_to, is_current``) on the
    version active at ``fact_ts_col`` (timestamp or integer micros).
    Dimension attribute columns come back prefixed with
    ``dim_prefix``; all fact columns pass through."""
    from crgp_spark.functions import ts_micros

    for c in (key_col, "valid_from", "valid_to"):
        if c not in dim.columns:
            raise ValueError(f"dim is missing SCD2 column {c!r}")
    fact_ts = facts.schema[fact_ts_col].dataType.typeName()
    us = (
        F.col(fact_ts_col).cast("long")
        if fact_ts in ("long", "integer", "bigint")
        else ts_micros(fact_ts_col)
    )
    attrs = [
        c
        for c in dim.columns
        if c not in (key_col, "valid_from", "valid_to", "is_current")
    ]
    d = dim.select(
        F.col(key_col).alias("_dk"),
        F.col("valid_from").alias("_vf"),
        F.col("valid_to").alias("_vt"),
        *[F.col(c).alias(f"{dim_prefix}{c}") for c in attrs],
    )
    f = facts.withColumn("_fus", us)
    joined = f.join(
        d,
        (F.col(key_col) == F.col("_dk"))
        & (F.col("_fus") >= F.col("_vf"))
        & (F.col("_vt").isNull() | (F.col("_fus") < F.col("_vt"))),
        "left",
    )
    return joined.drop("_dk", "_vf", "_vt", "_fus")
