"""Robust outlier detection: median absolute deviation (MAD) per
group — the robust-statistics alternative to `anomaly.py`'s
mean/sigma windows (a single wild value drags a mean; it cannot drag
a median).  Hampel's rule: flag x when |x − median| > nsig · MAD.

Plan shape: two grouped exact-percentile aggregates (the same
sort-based `percentile` the `quantiles` entry gates; map-side
partial) and two group-table joins — group tables are
metadata-sized, so Catalyst broadcasts them and the data is scanned
twice with no self-shuffle.  All inputs are integer (cents); the
medians are exact multiples of 0.5, so every double here is
bit-identical across engines (no rounding idiom needed), and the
gate-facing summary carries them as exact ``2×`` BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mad_flag(
    df: DataFrame, key: str, val: Column, nsig: float = 3.0
) -> DataFrame:
    """Row-level flags: the input columns plus ``_med``, ``_mad`` and
    ``is_outlier`` (|val − median| > nsig·MAD within the key group).
    Groups with MAD = 0 (a majority of identical values) flag every
    deviating row — the standard Hampel degenerate case."""
    v = val.alias("_v")
    pts = df.select(F.col(key), v)
    med = pts.groupBy(key).agg(F.percentile("_v", 0.5).alias("_med"))
    dev = pts.join(med, key).withColumn(
        "_dev", F.abs(F.col("_v") - F.col("_med"))
    )
    mad = dev.groupBy(key).agg(F.percentile("_dev", 0.5).alias("_mad"))
    return dev.join(mad, key).withColumn(
        "is_outlier", F.col("_dev") > F.lit(nsig) * F.col("_mad")
    )


def mad_summary(
    df: DataFrame, key: str, val: Column, nsig: float = 3.0
) -> DataFrame:
    """Per-group robust summary: ``(key, n, med2x, mad2x, n_out)`` —
    median and MAD carried as exact 2× BIGINTs (medians of integers
    are multiples of 0.5)."""
    flagged = mad_flag(df, key, val, nsig)
    return flagged.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        (F.min("_med") * 2).cast("long").alias("med2x"),
        (F.min("_mad") * 2).cast("long").alias("mad2x"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_out"),
    )


def winsorized_stats(
    df: DataFrame, key: str, val: Column, trim_pct: int = 5
) -> DataFrame:
    """Per-group winsorized summary: clamp each tail's ``trim_pct``%
    (by COUNT — ``k = n·pct // 100`` rows per tail, the rank-based
    type-1 convention, all integer arithmetic) to the surviving
    boundary order statistics, then average.  Returns ``(key, n, lo,
    hi, wsum, wmean)``: lo/hi are the clamp cutoffs (the (k+1)-th and
    (n−k)-th smallest values — exact BIGINTs), ``wsum`` the exact
    clamped integer sum, ``wmean`` ONE IEEE division — the robust mean
    that a handful of fat-finger values cannot drag, with none of
    MAD's degenerate all-flagged case.

    Plan shape: one per-key sort window for ranks, a broadcast-sized
    per-group cutoff table, one clamped re-aggregate — two scans, no
    self-shuffle, no global sort."""
    if not 0 <= trim_pct < 50:
        raise ValueError("trim_pct must be in [0, 50)")
    pts = df.select(F.col(key), val.cast("long").alias("_v"))
    w = Window.partitionBy(key).orderBy("_v")
    ranked = pts.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(key))
    )
    k = F.expr(f"(_n * {trim_pct}) div 100")
    cuts = ranked.groupBy(key).agg(
        F.max("_n").cast("long").alias("n"),
        F.min(F.when(F.col("_rn") > k, F.col("_v"))).alias("lo"),
        F.max(
            F.when(F.col("_rn") <= F.col("_n") - k, F.col("_v"))
        ).alias("hi"),
    )
    clamped = pts.join(F.broadcast(cuts), key).select(
        F.col(key),
        "n",
        "lo",
        "hi",
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("_v"))).alias(
            "_c"
        ),
    )
    return clamped.groupBy(key, "n", "lo", "hi").agg(
        F.sum("_c").cast("long").alias("wsum"),
        (F.sum("_c").cast("double") / F.max("n").cast("double")).alias(
            "wmean"
        ),
    ).select(key, "n", "lo", "hi", "wsum", "wmean")
