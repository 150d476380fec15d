"""Mergeable bucket-histogram sketch with quantile estimation.

Third member of the engine's mergeable-state trio (`sketch.kmv_*` for
distinct counts, `bloomjoin.bloom_filter_table` for membership): a
fixed-boundary histogram whose per-bucket counts are plain BIGINTs, so
the merge operation is ``SUM`` — the most map-side-combinable monoid
there is.  This is how a 100 TB pipeline serves grouped quantiles
without the global per-group sort that exact percentiles
(`quantiles.grouped_percentiles`) require: persist per-partition /
per-day histograms, merge by addition, read quantiles off the
cumulative counts.

Unlike t-digest / KLL (whose centroids depend on insertion order and
engine internals), a fixed-boundary histogram is a pure function of
the input — deterministic, engine-agnostic, and therefore
oracle-checkable bit-for-bit.  The price is static boundaries: error
is bounded by bucket width, and callers choose boundaries to match
their value domain (log-spaced for long tails).

Quantile convention: ``q`` maps to element rank ``ceil(q * n)``
(1-based, the nearest-rank definition); the estimate returned is the
UPPER boundary of the bucket containing that rank — i.e. a value ``v``
with ``P(X <= v) >= q`` guaranteed, the same one-sided guarantee
Spark's ``approx_percentile`` documents.  Values above the last
boundary report NULL (unbounded tail; add an explicit +inf-ish cap if
closure is needed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_boundaries(boundaries: Sequence[float]) -> list[float]:
    bs = list(boundaries)
    if len(bs) < 1:
        raise ValueError("need at least one boundary")
    if sorted(bs) != bs or len(set(bs)) != len(bs):
        raise ValueError("boundaries must be strictly increasing")
    return bs


def hist_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    boundaries: Sequence[float],
) -> DataFrame:
    """Per-group histogram: ``(group_col, bucket, n)`` where ``bucket``
    is the index of the first boundary >= value (values above the last
    boundary land in overflow bucket ``len(boundaries)``).  Only
    non-empty buckets are materialized — the sketch is sparse."""
    bs = _check_boundaries(boundaries)
    v = F.col(value_col)
    barr = F.array(*[F.lit(float(b)) for b in bs])
    bucket = F.size(F.filter(barr, lambda b: b < v))
    return (
        df.where(v.isNotNull())
        .select(F.col(group_col), bucket.alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hist_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketch tables by bucket-count addition — the monoid
    op; ``merge(sketch(X), sketch(Y)) == sketch(X ∪ Y)`` exactly."""
    ga, gb = a.columns[0], b.columns[0]
    return (
        a.unionByName(b.withColumnRenamed(gb, ga))
        .groupBy(ga, "bucket")
        .agg(F.sum("n").alias("n"))
    )


def hist_quantiles(
    sketches: DataFrame,
    boundaries: Sequence[float],
    qs: Sequence[float],
) -> DataFrame:
    """Read quantiles off a sketch table: ``(group, q, n_total,
    est)`` per requested quantile — ``est`` is the upper boundary of
    the bucket holding rank ``ceil(q * n_total)`` (NULL for overflow).
    Integer rank math throughout: bit-exact cross-engine."""
    bs = _check_boundaries(boundaries)
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    g = sketches.columns[0]
    cum = sketches.select(
        g,
        "bucket",
        F.sum("n").over(Window.partitionBy(g).orderBy("bucket")).alias("cum"),
        F.sum("n").over(Window.partitionBy(g)).alias("n_total"),
    )
    barr = F.array(*[F.lit(float(b)) for b in bs])
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    exploded = cum.select(
        g, "bucket", "cum", "n_total", F.explode(qarr).alias("q")
    )
    # rank = ceil(q * n): integer via (n*q) ceil on exact double product
    rank = F.ceil(F.col("q") * F.col("n_total"))
    hit = exploded.where(F.col("cum") >= rank)
    first_bucket = hit.groupBy(g, "q", "n_total").agg(
        F.min("bucket").alias("bucket")
    )
    est = F.when(
        F.col("bucket") < len(bs), F.element_at(barr, F.col("bucket") + 1)
    )
    return first_bucket.select(g, "q", "n_total", est.alias("est"))


def hist_grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    boundaries: Sequence[float],
    qs: Sequence[float],
) -> DataFrame:
    """sketch → quantiles in one call (the non-incremental path)."""
    return hist_quantiles(
        hist_sketch(df, group_col, value_col, boundaries), boundaries, qs
    )
