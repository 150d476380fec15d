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
    estimate (== the exact count below ``k``), rounded to 4 decimals."""
    hashes = df.select(
        group_col, F.md5(F.col(value_col).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    topk = hashes.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    agg = topk.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.max("h").alias("_kmax"),
    )
    kth_num = F.conv(F.substring("_kmax", 1, 15), 16, 10).cast("long")
    return agg.select(
        group_col,
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
