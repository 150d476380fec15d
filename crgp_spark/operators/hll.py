"""HyperLogLog distinct sketch with deterministic registers.

Industry-standard distinct counting (Flajolet et al. 2007; Heule et al.
HLL++ 2013 — what Spark's own ``approx_count_distinct`` runs) — but
engine builtins are opaque and engine-specific, so they can never
cross-validate. Like sketch.py's KMV, the registers here hash with md5
(the module family's determinism idiom): the sketch is a pure function
of the input, bit-identical in Spark and the DuckDB oracle, and
mergeable across shards/epochs by per-register MAX — the property that
makes HLL the warehouse-rollup workhorse (persist per-partition
sketches, fold them at query time; merging is a commutative idempotent
monoid so partial aggregation applies everywhere).

Register assignment for value hash ``h`` (60-bit md5 prefix): register
index = ``h mod 2^p`` (low p bits), observable = position of the
lowest set bit of ``h >> p``, 1-based, capped at ``cap`` — pure
integer mod ladders shared verbatim with the SQL twin (the anf.py
idiom; no bit intrinsics, no float).

The gated surface stays integer-exact: per group the summary reports
``(m, v_zero, s_scaled)`` where ``s_scaled = Σ_j 2^(cap - M_j)`` over
all ``m`` registers (absent register ⇒ ``M_j = 0`` ⇒ ``2^cap``) — the
harmonic-mean denominator scaled by ``2^cap``, an exact BIGINT — plus
the raw α-estimate via one IEEE division + ``decimal_round``. The
bias/small-range-corrected estimate (needs ``ln``, whose libm rounding
is not cross-engine stable) lives driver-side in
:func:`hll_estimate`.

Scale shape at 100 TB: one map-side-combinable MAX over ``(group,
idx)`` (≤ ``m`` rows per group survive the map side), then an
``m``-row-per-group fold — strictly cheaper than KMV's top-k window
and the exact-distinct shuffle it replaces.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round, md5_num60


def _rank(hq: Column, cap: int) -> Column:
    """1-based lowest-set-bit position of ``hq``, capped at ``cap``
    (``hq = 0`` ⇒ ``cap``) — integer mod ladder, SQL twin
    ``_sql_hll_rank`` in ``__spark_entry__.py``."""
    expr = F.lit(cap)
    for k in range(cap - 2, -1, -1):
        expr = F.when(hq % (1 << (k + 1)) == (1 << k), F.lit(k + 1)).otherwise(
            expr
        )
    return expr


def _alpha(m: int) -> float:
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def hll_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 6,
    cap: int = 40,
) -> DataFrame:
    """The sketch itself: ``(group_col, idx, rank)`` — at most
    ``m = 2^p`` register rows per group, the state a warehouse
    persists per shard/epoch. Absent registers mean 0."""
    h = md5_num60(F.col(value_col).cast("string"))
    return (
        df.select(
            group_col,
            F.pmod(h, F.lit(1 << p)).cast("int").alias("idx"),
            _rank(F.shiftright(h, p), cap).alias("rank"),
        )
        .groupBy(group_col, "idx")
        .agg(F.max("rank").alias("rank"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Monoid fold of two sketches: per-register MAX. Commutative,
    associative, idempotent — so sketches roll up across any shard or
    time partitioning."""
    return (
        a.unionByName(b)
        .groupBy(group_col, "idx")
        .agg(F.max("rank").alias("rank"))
    )


def hll_summary(
    sketch: DataFrame,
    group_col: str,
    p: int = 6,
    cap: int = 40,
    round_places: int = 4,
) -> DataFrame:
    """Integer-exact per-group summary ``(group, m, v_zero, s_scaled,
    raw_est)``: ``v_zero`` = registers still 0, ``s_scaled`` = the
    2^cap-scaled harmonic denominator, ``raw_est`` = the uncorrected
    α·m²/Σ2^-M estimate (one IEEE division, ``decimal_round``-pinned).
    Feed a row to :func:`hll_estimate` for the corrected count."""
    m = 1 << p
    c_num = _alpha(m) * m * m * float(1 << cap)
    pow_term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {cap} - rank)")
    return (
        sketch.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("_nreg"),
            F.sum(pow_term).alias("_s_present"),
        )
        .select(
            group_col,
            F.lit(m).cast("int").alias("m"),
            (F.lit(m) - F.col("_nreg")).cast("int").alias("v_zero"),
            (
                F.col("_s_present")
                + (F.lit(m) - F.col("_nreg")) * F.lit(1 << cap)
            )
            .cast("long")
            .alias("s_scaled"),
            decimal_round(
                F.lit(c_num) / F.col("s_scaled").cast("double"), round_places
            ).alias("raw_est"),
        )
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 6,
    cap: int = 40,
) -> DataFrame:
    """Sketch + summarize in one pass — the grouped
    approx-count-distinct drop-in with a cross-checkable estimate."""
    return hll_summary(
        hll_sketch(df, group_col, value_col, p, cap), group_col, p, cap
    )


def hll_estimate(m: int, v_zero: int, raw_est: float) -> float:
    """Driver-side corrected estimate from a summary row: linear
    counting when the raw estimate is small and empty registers remain
    (Flajolet §4 small-range correction); ``ln`` stays out of the
    gated surface."""
    if raw_est <= 2.5 * m and v_zero > 0:
        return m * math.log(m / v_zero)
    return raw_est
