"""Data profiling and declarative quality checks (the Deequ /
great-expectations primitives, Spark-first).

A 100 TB curation pipeline spends most of its life *validating* tables
— null rates, key uniqueness, domain bounds — before anything joins
them.  Both operators here are single-pass, map-side-combinable
aggregations over the input (ONE job, no shuffle beyond the final
1-row combine), so profiling a petabyte costs one scan:

- `profile_table`: one `agg()` computes every column's non-null count,
  distinct count, min and max simultaneously (multi-distinct becomes
  one Expand plan — Catalyst's standard shape, still partial-agg), then
  a 1-row explode unpivots to one row per column.  min/max are cast to
  string AFTER native-type aggregation, so ordering is the column
  type's, not lexicographic.
- `check_constraints`: each check is a SQL predicate; violations are
  conditional counts folded into the same single aggregate, so N
  checks still cost one scan.

No reference counterpart (the reference validates CLI inputs only,
`src/validation.rs:11-25`, which `crgp_spark/validation.py` mirrors);
this extends validation to the data plane.

Caveat for cross-engine oracles: profile only integral / string /
timestamp columns there — float→string formatting differs between
engines (the operator itself takes any column).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: Sequence[str] | None = None
) -> DataFrame:
    """One row per profiled column: ``(column, n_rows, n_nonnull,
    n_nulls, n_distinct, min_value, max_value)`` — min/max as strings
    of the natively-ordered extremes, NULL on all-null columns."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"_nn{i}"),
            F.countDistinct(F.col(c)).alias(f"_nd{i}"),
            F.min(F.col(c)).cast("string").alias(f"_mn{i}"),
            F.max(F.col(c)).cast("string").alias(f"_mx{i}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn{i}").alias("n_nonnull"),
                (F.col("_n") - F.col(f"_nn{i}")).alias("n_nulls"),
                F.col(f"_nd{i}").alias("n_distinct"),
                F.col(f"_mn{i}").alias("min_value"),
                F.col(f"_mx{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def check_constraints(
    df: DataFrame, checks: Sequence[tuple[str, str]]
) -> DataFrame:
    """Evaluate named SQL-predicate checks in ONE scan: returns
    ``(check, n_rows, n_violations, passed)`` per check.  A row
    violates a check when the predicate is not TRUE (i.e. FALSE *or
    NULL* — a NULL comparison is a failed expectation, matching Deequ).
    """
    if not checks:
        raise ValueError("no checks given")
    names = [n for n, _ in checks]
    if len(set(names)) != len(names):
        raise ValueError("duplicate check names")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, pred) in enumerate(checks):
        ok = F.coalesce(F.expr(pred).cast("boolean"), F.lit(False))
        aggs.append(
            F.sum(F.when(ok, F.lit(0)).otherwise(F.lit(1))).alias(f"_v{i}")
        )
    one = df.agg(*aggs)
    per_check = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v{i}").alias("n_violations"),
                (F.col(f"_v{i}") == 0).alias("passed"),
            )
            for i, (name, _) in enumerate(checks)
        ]
    )
    return one.select(F.explode(per_check).alias("c")).select("c.*")
