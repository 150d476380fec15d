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
