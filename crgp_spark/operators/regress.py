"""Grouped ordinary-least-squares trend: one linear slope per key —
the "is this metric drifting?" primitive behind per-user engagement
trends, per-table growth curves, per-shard throughput regressions.

All moments are exact BIGINT sums in ONE combinable groupBy; the only
float op is the final ``num/den`` division of two exact integers,
which IEEE-754 rounds identically in Spark and DuckDB (same operands,
one correctly-rounded op) — so the oracle twin matches bit-for-bit
without any rounding idiom.

x is rebased per key (``x - min(x)``) before the moment sums: the
slope is shift-invariant, and rebasing keeps the overflow envelope
tight — with per-key spans ``x' <= S`` and ``|y| <= Y`` the worst
term is ``n·Σx'y <= n²·S·Y``, e.g. n=10⁴ observations over a 10³
span of 10⁶-cent values stays below 10¹⁷ < 2⁶³ (the
`anomaly.py`-style documented envelope; callers with wilder scales
pre-bucket x or y).  One exchange on the key serves both the rebase
window and the moment groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_trend(df: DataFrame, key: str, x: Column, y: Column) -> DataFrame:
    """Per-``key`` OLS fit of ``y`` on ``x`` (both integer-valued
    columns): returns ``(key, n, num, den, slope)`` where
    ``slope = num/den = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` — the exact
    integer numerator/denominator are kept alongside the float slope;
    ``slope`` is NULL when all x in a group are equal (den = 0)."""
    w = Window.partitionBy(key)
    reb = df.select(
        F.col(key), x.cast("long").alias("_x0"), y.cast("long").alias("_y")
    ).withColumn("_x", F.col("_x0") - F.min("_x0").over(w))
    s = reb.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    num = F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        den == 0, F.lit(None).cast("double")
    ).otherwise(num.cast("double") / den.cast("double"))
    return s.select(
        key,
        "n",
        num.alias("num"),
        den.alias("den"),
        slope.alias("slope"),
    )
