"""CUSUM change-point detection, integer-exact.

The one-sided cumulative-sum control chart (Page 1954): with drift
allowance ``k``, the recursive statistic

    C_t = max(0, C_{t-1} + (x_t - k)),     alarm when C_t > h

flags a sustained upward shift in a grouped, ordered series. The
recursion looks sequential, but it has a closed prefix form —

    C_t = S_t - min_{0<=i<=t} S_i,   S_t = Σ_{i<=t} (x_i - k)

— so the whole chart is ONE window pass (running sum + running min,
both ``ROWS UNBOUNDED PRECEDING``), partitioned by group: scan-speed,
no recursion, no per-row Python. To keep both engines bit-identical the
drift and threshold are RATIONAL (``k = k_num/k_den``): every term is
cross-multiplied into ``x·k_den − k_num`` integer units, and the alarm
compares ``C_t·h_den > h·k_den`` — BIGINT arithmetic end to end, no
floats anywhere. Downward shifts are the same chart over ``−x``.

The reference has no monitoring operator (its stats are terminal
counters, ``statistics.rs:17-131``); CUSUM is the standard drift watch
its users put on event-value streams downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cusum_chart(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    value: Column,
    k_num: int,
    k_den: int = 1,
    h_num: int | None = None,
    h_den: int = 1,
) -> DataFrame:
    """Per-row CUSUM chart ``(group_cols..., rn, x, cusum_scaled,
    alarm)`` over the integer ``value`` column ordered by ``order_cols``
    within each group. ``cusum_scaled`` is in ``value·k_den`` units
    (divide by ``k_den`` for value units); ``alarm`` is set where
    ``cusum_scaled/k_den > h_num/h_den``. Detect downward shifts by
    passing ``-value``."""
    if k_den <= 0 or h_den <= 0:
        raise ValueError("k_den and h_den must be positive")
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    term = value.cast("long") * F.lit(k_den) - F.lit(k_num)
    s = F.sum(term).over(run)
    # the prefix min must include the EMPTY prefix S_0 = 0 (the
    # recursion starts at C_0 = 0), hence the LEAST(0, ...) clamp
    cus = (s - F.least(F.lit(0), F.min(s).over(run))).alias("cusum_scaled")
    out = df.select(
        *group_cols,
        F.row_number().over(w).alias("rn"),
        value.cast("long").alias("x"),
        cus,
    )
    if h_num is None:
        return out
    return out.withColumn(
        "alarm",
        (
            F.col("cusum_scaled") * F.lit(h_den)
            > F.lit(h_num) * F.lit(k_den)
        ).cast("boolean"),
    )


def cusum_alarms(chart: DataFrame, group_cols: list[str]) -> DataFrame:
    """First alarm per group: ``(group_cols..., first_alarm_rn,
    n_alarms)`` — the change-point report (groups with no alarm are
    absent)."""
    return (
        chart.filter(F.col("alarm"))
        .groupBy(*group_cols)
        .agg(
            F.min("rn").alias("first_alarm_rn"),
            F.count(F.lit(1)).alias("n_alarms"),
        )
    )


def pettitt_test(
    series: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """Exact Pettitt (1979) rank-based change-point test over an
    ordered series ``(t_col, x_col)`` with unique ``t``: one row
    ``(n, k_stat, cp)`` where

        U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j),
        K   = max_t |U_t|,   cp = earliest t attaining K.

    The O(n²) double sum collapses to one rank pass plus one prefix
    sum via the recursion ``U_t = U_{t−1} + Σ_{s≠t} sgn(x_t − x_s)``,
    and the per-row increment is ``lt(x_t) − gt(x_t)`` — the counts of
    strictly-smaller / strictly-larger values over the whole series,
    read off value-level cumulative counts. BIGINT end to end (no
    floats at all); the p-value approximation ``2·exp(−6K²/(n³+n²))``
    needs `exp`, which engines round differently, so it is left to the
    caller — K and n are the engine-exact sufficient statistics.

    Scale posture: both windows run over the *series grid* (e.g. one
    row per day), which is orders of magnitude smaller than the event
    data that produced it; the data-sized stages are the grouped
    aggregations upstream in the caller. The reference has no
    monitoring operator (terminal counters only,
    ``statistics.rs:17-131``); Pettitt is the standard nonparametric
    "did the level shift, and when" readout on such series."""
    n1 = series.agg(F.count(F.lit(1)).alias("n"))
    cnt = series.groupBy(x_col).agg(F.count(F.lit(1)).alias("c"))
    wx = Window.orderBy(x_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranks = cnt.select(x_col, "c", F.sum("c").over(wx).alias("cle"))
    j = series.join(ranks, x_col).join(F.broadcast(n1))
    incr = (F.col("cle") - F.col("c")) - (F.col("n") - F.col("cle"))
    wt = j.select(F.col(t_col).alias("_t"), incr.alias("w"))
    wu = Window.orderBy("_t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    u = wt.select("_t", F.sum("w").over(wu).alias("u"))
    k = u.agg(F.max(F.abs(F.col("u"))).alias("k_stat"))
    return (
        u.join(F.broadcast(k))
        .where(F.abs(F.col("u")) == F.col("k_stat"))
        .groupBy("k_stat")
        .agg(F.min("_t").alias("cp"))
        .join(F.broadcast(n1))
        .select("n", "k_stat", "cp")
    )
