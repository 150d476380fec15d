"""Rolling z-score anomaly flags, integer-exact.

Streaming-style outlier detection as one RANGE-frame window: each
event is compared against the mean and variance of the SAME user's
trailing window (event-time range, e.g. 7 days, current row
included).  The z-score test runs entirely in BIGINT via
cross-multiplication —

    |x - s/n| > z * sigma   <=>   (x*n - s)^2 > z^2 * (n*ss - s^2)

with x, s (sum), ss (sum of squares) in integer cents — so the flag
is bit-identical across engines and immune to float summation order,
the same discipline as the TPC-H money family.

Overflow envelope (the binding terms are ``s*s`` and ``(x*n - s)^2``):
the per-window SUM of cents must stay below ~3.0e9 — e.g. values up
to $1,000 (1e5 cents) with up to ~30k events per key per window.
Beyond that both engines fail loudly (Spark ANSI ArithmeticException,
DuckDB overflow error) rather than mis-flag; for heavier-tailed
domains rescale the unit (dollars instead of cents) or shorten the
window before calling.

Plan shape: ONE exchange on the key; both RANGE-frame aggregates
share the single sort.  At 100 TB this is the cheap kind of window —
bounded by events-per-key-per-window, no joins, no state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 7 * 86_400_000_000,
    z: int = 2,
    min_n: int = 8,
) -> DataFrame:
    """Events whose value deviates more than ``z`` sigmas from their
    trailing-window mean: ``(event_id, key_col, us, cents, n_window)``.
    Windows with fewer than ``min_n`` points never flag (variance of
    a handful of points is noise).  ``z`` is an integer multiplier so
    the squared comparison stays in BIGINT."""
    if window_us <= 0 or z <= 0 or min_n < 2:
        raise ValueError("window_us and z must be positive, min_n >= 2")
    from crgp_spark.functions import ts_micros

    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = events.select(
        "event_id",
        F.col(key_col),
        ts_micros(ts_col).alias("us"),
        cents.alias("cents"),
    ).where(F.col("cents").isNotNull())
    w = (
        Window.partitionBy(key_col)
        .orderBy("us")
        .rangeBetween(-window_us, 0)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum("cents").over(w)
    ss = F.sum(F.col("cents") * F.col("cents")).over(w)
    lhs = (F.col("cents") * n - s) * (F.col("cents") * n - s)
    rhs = F.lit(z * z) * (n * ss - s * s)
    return (
        base.withColumn("n_window", n.cast("long"))
        .withColumn("_lhs", lhs)
        .withColumn("_rhs", rhs)
        .where((F.col("n_window") >= min_n) & (F.col("_lhs") > F.col("_rhs")))
        .drop("_lhs", "_rhs")
    )
