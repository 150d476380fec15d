"""Time-series resampling: regular-grid bucketing + gap fill.

Metric pipelines need series on a regular grid (daily balances,
hourly gauges) out of irregular event streams; the two halves are
(1) last-observation-per-bucket downsampling and (2) forward-filling
the empty buckets.  Both are per-key local:

- downsample: ONE combinable ``max_by`` groupBy — the deterministic
  "last" is picked by `functions.ord_key` (ts micros, seq), never by
  arrival order;
- spine: per-key ``sequence(min_bucket, max_bucket)`` + explode — the
  grid never leaves the key's partition and its length is the key's
  own span, so a 100 TB corpus of short series stays linear;
- fill: the count-prefix trick — ``count(val) OVER (ORDER BY bucket)``
  is constant within a fill group and steps at each observation, so
  ``max(val)`` over ``(key, grp)`` propagates the single non-null
  forward.  Same idiom in the DuckDB twin; no reliance on either
  engine's IGNORE NULLS quirks.

Windows are partitioned by key — no global-sort hazard.  Spine starts
at each key's first observation, so fill groups always contain their
observation (no leading NULLs to special-case).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import ord_key, ts_micros

DAY_US = 86_400_000_000


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str,
    val: Column,
    seq: str,
    step_us: int = DAY_US,
) -> DataFrame:
    """Regular-grid series per ``key``: bucket ``ts`` to ``step_us``
    ticks, keep the last ``val`` per (key, bucket) — last by
    ``(ts, seq)``, ``seq`` breaking ties deterministically — then
    forward-fill the buckets between each key's first and last
    observation.  Returns ``(key, bucket, val)`` with ``val`` the
    filled value and ``bucket`` in ``step_us`` units since epoch."""
    us = ts_micros(F.col(ts))
    # integer bucket math: double division rounds midnight-minus-1µs
    # UP through the 2^53 mantissa — (us - us % step) / step stays exact
    step = F.lit(step_us)
    obs = (
        df.select(
            F.col(key),
            ((us - us % step) / step).cast("long").alias("bucket"),
            val.alias("_v"),
            ord_key(us, F.col(seq)).alias("_ord"),
        )
        .groupBy(key, "bucket")
        .agg(F.max_by("_v", "_ord").alias("_obs"))
    )
    spine = (
        obs.groupBy(key)
        .agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
        .select(
            key, F.explode(F.sequence("_mn", "_mx")).alias("bucket")
        )
    )
    j = spine.join(obs, [key, "bucket"], "left")
    w_prefix = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = j.withColumn("_grp", F.count("_obs").over(w_prefix))
    filled = F.max("_obs").over(Window.partitionBy(key, "_grp"))
    return g.select(key, "bucket", filled.alias("val"))


def seasonal_decompose(
    df: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive decomposition of a daily integer series into
    trend + seasonal + residual (the moving-average STL ancestor;
    Kendall's "ratio-to-moving-average" in additive form):

        trend(d)    = centered ``period``-day moving average
        seasonal(p) = mean of (x - trend) over phase p = day % period
        residual    = (x - trend) - seasonal

    ``period`` must be ODD (centered window of 2h+1 calendar days,
    h = (period-1)/2).  The window is a RANGE frame on the day number
    — calendar-aware, so a gap in the series yields NULL trend (n <
    period) instead of silently averaging misaligned rows.

    Cross-engine exactness: all moments are integer — ``t = Σ window
    x`` (trend·period), ``d = period·x − t`` (detrended·period),
    seasonal numerator ``Σ_phase d`` — and every float output is one
    or two CORRECTLY-ROUNDED IEEE ops on those exact integers
    (trend = t/period, seasonal = Σd/(period·m), residual = d/period −
    Σd/(period·m)), so both engines produce bit-identical doubles with
    no quantization epsilon.

    Scale shape: one per-key RANGE window + one (key, phase) groupBy +
    a broadcast-sized recombine join — no global sorts; series length
    per key is the only state."""
    if period < 3 or period % 2 == 0:
        raise ValueError("period must be odd and >= 3")
    half = (period - 1) // 2
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("day")
        .rangeBetween(-half, half)
    )
    x = F.col(value_col).cast("long")
    base = df.select(*key_cols, F.col(day_col).alias("day"), x.alias("x"))
    t = base.withColumn("_n", F.count(F.lit(1)).over(w)).withColumn(
        "_t",
        F.when(F.col("_n") == period, F.sum("x").over(w)),
    ).withColumn("_d", F.lit(period) * F.col("x") - F.col("_t"))
    phase = (F.col("day") % period).alias("phase")
    seas = (
        t.where(F.col("_t").isNotNull())
        .groupBy(*key_cols, phase)
        .agg(F.sum("_d").alias("_sn"), F.count(F.lit(1)).alias("_m"))
    )
    joined = t.withColumn("phase", F.col("day") % period).join(
        F.broadcast(seas), [*key_cols, "phase"], "left"
    )
    seasonal = F.col("_sn").cast("double") / (
        F.lit(period) * F.col("_m")
    ).cast("double")
    return joined.select(
        *key_cols,
        "day",
        "x",
        (F.col("_t").cast("double") / period).alias("trend"),
        F.when(F.col("_t").isNotNull(), seasonal).alias("seasonal"),
        F.when(
            F.col("_t").isNotNull(),
            F.col("_d").cast("double") / period - seasonal,
        ).alias("residual"),
    )
