"""Survivorship: merge duplicate-record clusters into golden records.

The last stage of the entity-resolution pipeline the engine already
ships piecewise — blocking (`fuzzy.fuzzy_pairs_ed1`,
`dedup.lsh_candidate_pairs`), matching (levenshtein / jaccard
verification), clustering (`dedup.neardup_clusters`) — and the one
that turns clusters into a usable dimension: one canonical row per
cluster with per-field survivorship rules:

- **latest**: the field value of the most recent record (recency
  rule), deterministic via the zero-padded ``micros:order`` composite
  key (the `attribution` idiom);
- **mode**: the most frequent value (frequency rule), ties broken by
  the smallest STRING form of the value (exact for string fields; for
  numeric fields lexicographic — "10" < "9" — so zero-pad upstream if
  numeric tie order matters) — computed from per-(cluster, value)
  counts and folded back with one join per mode field.

Scale shape: the base rollup is ONE map-side-combinable groupBy on
the cluster key; each mode field adds one (cluster, value) count
groupBy + a cluster-keyed join of 1-row-per-cluster results — all
partial-agg friendly, no windows, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordkey(us: F.Column, order_cols: Sequence[str]) -> F.Column:
    from crgp_spark.functions import ord_key

    return ord_key(us, *order_cols)


def golden_records(
    df: DataFrame,
    cluster_col: str,
    ts_col: str,
    order_cols: Sequence[str] = (),
    latest_cols: Sequence[str] = (),
    mode_cols: Sequence[str] = (),
) -> DataFrame:
    """One row per cluster: ``(cluster_col, n_records, first_us,
    last_us, latest_<c>..., mode_<c>...)``.  ``latest_<c>`` is the
    value carried by the record with the greatest ``(ts, order_cols)``
    key; ``mode_<c>`` the most frequent non-null value (smallest value
    on count ties).

    Cross-engine caveat: engines disagree on whether argmax skips
    records whose FIELD value is NULL (DuckDB's ``ARG_MAX`` does) —
    keep ``latest_cols`` to effectively non-null fields where an
    oracle twin must match."""
    if not latest_cols and not mode_cols:
        raise ValueError("need at least one latest_cols or mode_cols")
    from crgp_spark.functions import ts_micros

    us = ts_micros(ts_col)
    key = _ordkey(us, order_cols)
    aggs = [
        F.count(F.lit(1)).alias("n_records"),
        F.min(us).alias("first_us"),
        F.max(us).alias("last_us"),
    ]
    for c in latest_cols:
        aggs.append(F.max_by(F.col(c), key).alias(f"latest_{c}"))
    out = df.groupBy(cluster_col).agg(*aggs)
    for c in mode_cols:
        counts = (
            df.where(F.col(c).isNotNull())
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        # most frequent, then smallest value: min_by on the composite
        # (descending count via 10^12 - n, then the value itself)
        mkey = F.concat_ws(
            ":",
            F.lpad((F.lit(1_000_000_000_000) - F.col("_n")).cast("string"),
                   13, "0"),
            F.col(c).cast("string"),
        )
        mode = counts.groupBy(cluster_col).agg(
            F.min_by(F.col(c), mkey).alias(f"mode_{c}")
        )
        out = out.join(mode, cluster_col, "left")
    return out
