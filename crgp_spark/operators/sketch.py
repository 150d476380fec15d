"""KMV (k-minimum-values) distinct-count sketch, deterministic.

The missing sketch half of approximate analytics: Spark's
``approx_count_distinct`` (HyperLogLog++) and DuckDB's
``approx_count_distinct`` (its own HLL) are engine-specific and can
never cross-validate; the KMV estimator (Bar-Yossef et al. 2002 — the
basis of DataSketches' theta sketch) is just "keep the k smallest
hashes", which is a pure function of the input under a deterministic
hash.  Hashing with md5 (the module family's idiom) makes the sketch —
and therefore the estimate — bit-identical in Spark and the DuckDB
oracle, while behaving statistically like a uniform hash.

Estimator: with ``h_(k)`` the k-th smallest distinct hash mapped into
``[0, 1)``, the distinct count is ``(k-1) / h_(k)``; groups with fewer
than ``k`` distinct hashes report their exact count.  Hashes order as
fixed-width hex strings (lexicographic == numeric); only the single
k-th hash per group is converted to a number (its top 15 hex digits =
60 bits, BIGINT-exact in both engines), and the one long→double cast
and division are IEEE-identical, so ``decimal_round`` closes the
cross-engine contract.

Scale shape at 100 TB: one map-side-combinable distinct over ``(group,
hash)``, then a rank-limit window per group — Spark turns ``rank <= k``
into ``WindowGroupLimit``, pruning every partition to its local top-k
before the shuffle, so per-group work is O(k) after the scan (the
`neighbor_sample` idiom).  Merging two sketches = union + re-limit,
which is why warehouses persist KMV sets for incremental rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round

#: 2^60 — the numeric range of a 15-hex-digit hash prefix
_HASH_SPACE = float(1 << 60)


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """The sketch itself: ``(group_col, hs)`` where ``hs`` is the
    sorted array of the group's ≤ k smallest distinct value hashes.
    This is the state a warehouse PERSISTS for incremental rollups —
    see `kmv_merge` for the monoid operation."""
    hashes = df.select(
        group_col, F.md5(F.col(value_col).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        hashes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_list("h")).alias("hs"))
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 32) -> DataFrame:
    """Merge two sketch tables (full outer on the group key): union the
    hash sets, keep the k smallest.  ``merge(sketch(X), sketch(Y)) ==
    sketch(X ∪ Y)`` exactly — the commutative-monoid property that
    makes KMV rollup-able across partitions, days, or tenants."""
    ga, gb = a.columns[0], b.columns[0]
    joined = a.withColumnRenamed("hs", "_ha").join(
        b.withColumnRenamed("hs", "_hb").withColumnRenamed(gb, ga),
        ga,
        "full_outer",
    )
    merged = F.slice(
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("_ha"), F.array().cast("array<string>")),
                    F.coalesce(F.col("_hb"), F.array().cast("array<string>")),
                )
            )
        ),
        1,
        k,
    )
    return joined.select(ga, merged.alias("hs"))


def kmv_estimate(sketches: DataFrame, k: int = 32) -> DataFrame:
    """Estimates from a sketch table: same output contract as
    `kmv_distinct` — ``(group, n_kept, kth_hash, est_distinct)``."""
    agg = sketches.select(
        sketches.columns[0],
        F.size("hs").cast("int").alias("n_kept"),
        F.element_at("hs", -1).alias("_kmax"),
    )
    kth_num = F.conv(F.substring("_kmax", 1, 15), 16, 10).cast("long")
    return agg.select(
        sketches.columns[0],
        "n_kept",
        F.when(F.col("n_kept") >= k, F.col("_kmax")).alias("kth_hash"),
        F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")
        )
        .otherwise(
            decimal_round(
                F.lit(float(k - 1))
                / (kth_num.cast("double") / F.lit(_HASH_SPACE)),
                4,
            )
        )
        .alias("est_distinct"),
    )


def kmv_intersect(a: DataFrame, b: DataFrame, k: int = 32) -> DataFrame:
    """Theta-sketch intersection estimate (Dasgupta et al. /
    DataSketches theta semantics) from two sketch tables joined on
    the group key: ``theta`` = the smaller k-th hash of the two sides
    (NULL = both sides still exact), the estimate = |common hashes
    below theta| / theta — the audience-overlap primitive ("users in
    BOTH segments") that no union-based sketch can answer.  Returns
    ``(group, n_common, est_intersect)``; exact when both sides are
    below k (theta NULL).  Division order mirrors `kmv_estimate`
    exactly so the DuckDB twin is bit-identical."""
    ga, gb = a.columns[0], b.columns[0]
    joined = a.withColumnRenamed("hs", "_ha").join(
        b.withColumnRenamed("hs", "_hb").withColumnRenamed(gb, ga),
        ga,
        "inner",
    )
    kth = lambda c: F.when(F.size(c) >= k, F.element_at(c, -1))  # noqa: E731
    theta = F.least(kth(F.col("_ha")), kth(F.col("_hb")))
    common = F.array_intersect("_ha", "_hb")
    below = F.when(theta.isNull(), common).otherwise(
        F.filter(common, lambda h: h < theta)
    )
    sel = joined.select(
        ga,
        F.size(below).cast("int").alias("n_common"),
        F.conv(F.substring(theta, 1, 15), 16, 10)
        .cast("long")
        .alias("_thnum"),
    )
    return sel.select(
        ga,
        "n_common",
        F.when(
            F.col("_thnum").isNull(), F.col("n_common").cast("double")
        )
        .otherwise(
            decimal_round(
                F.col("n_common").cast("double")
                / (F.col("_thnum").cast("double") / F.lit(_HASH_SPACE)),
                4,
            )
        )
        .alias("est_intersect"),
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.  Returns
    ``(group_col, n_kept, kth_hash, est_distinct)``: ``n_kept`` =
    ``min(k, exact distinct)``, ``kth_hash`` the sketch boundary (hex;
    NULL while the group is still exact), ``est_distinct`` the KMV
    estimate (== the exact count below ``k``), rounded to 4 decimals.
    Composition of `kmv_sketch` + `kmv_estimate`."""
    return kmv_estimate(kmv_sketch(df, group_col, value_col, k), k)
