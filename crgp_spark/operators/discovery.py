"""Join-key discovery: which columns join which, estimated from
sketches (the Aurum / data-catalog primitive).

Profiling a lake you didn't build starts with "what joins to what".
Comparing every column pair exactly is quadratic in DATA; comparing
their KMV sketches is quadratic only in COLUMNS — each column is
reduced to its k smallest value-hashes (`sketch.kmv_sketch`), and for
every pair the theta-intersection machinery (`sketch.kmv_intersect`
semantics) yields distinct-count and overlap estimates, from which
directional containment ``|A∩B| / |A|`` ranks join candidates (a
foreign key is CONTAINED in its primary key: containment ≈ 1 one way,
< 1 the other).

Scale shape: one distinct + rank-limit (WindowGroupLimit) pass per
profiled column — each a single scan of that column only — then all
pairwise math runs on the sketch table, which has ONE ROW PER COLUMN:
metadata-sized, so the pair join is trivially cheap no matter how
large the profiled tables are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round
from crgp_spark.operators.sketch import _HASH_SPACE, kmv_sketch


def column_sketches(
    columns: dict[str, tuple[DataFrame, str]], k: int = 128
) -> DataFrame:
    """Sketch each named column: ``{col_id: (df, col_name)}`` → one
    ``(col_id, hs)`` row per column (the persistable catalog state —
    mergeable like every sketch in the family)."""
    if not columns:
        raise ValueError("no columns to sketch")
    parts = []
    for cid, (df, col) in columns.items():
        parts.append(
            kmv_sketch(
                df.select(F.lit(cid).alias("cid"), F.col(col).alias("v")),
                "cid",
                "v",
                k,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def join_candidates(sketches: DataFrame, k: int = 128) -> DataFrame:
    """All ordered column pairs with estimated distincts, overlap and
    containment: ``(col_a, col_b, est_a, est_b, est_common,
    containment)`` where ``containment`` ≈ |A∩B| / |A| (so a foreign
    key scores ~1.0 against its primary key).  The pair join runs on
    the one-row-per-column sketch table — metadata-sized."""
    kth = lambda c: F.when(F.size(c) >= k, F.element_at(c, -1))  # noqa: E731
    est = lambda c: F.when(  # noqa: E731
        F.size(c) < k, F.size(c).cast("double")
    ).otherwise(
        decimal_round(
            F.lit(float(k - 1))
            / (
                F.conv(F.substring(F.element_at(c, -1), 1, 15), 16, 10)
                .cast("long")
                .cast("double")
                / F.lit(_HASH_SPACE)
            ),
            4,
        )
    )
    a = sketches.select(
        F.col("cid").alias("col_a"), F.col("hs").alias("_ha")
    )
    b = sketches.select(
        F.col("cid").alias("col_b"), F.col("hs").alias("_hb")
    )
    pairs = a.join(b, F.col("col_a") < F.col("col_b"))
    theta = F.least(kth(F.col("_ha")), kth(F.col("_hb")))
    common = F.array_intersect("_ha", "_hb")
    below = F.when(theta.isNull(), common).otherwise(
        F.filter(common, lambda h: h < theta)
    )
    thnum = F.conv(F.substring(theta, 1, 15), 16, 10).cast("long")
    est_common = F.when(
        thnum.isNull(), F.size(below).cast("double")
    ).otherwise(
        decimal_round(
            F.size(below).cast("double")
            / (thnum.cast("double") / F.lit(_HASH_SPACE)),
            4,
        )
    )
    out = pairs.select(
        "col_a",
        "col_b",
        est(F.col("_ha")).alias("est_a"),
        est(F.col("_hb")).alias("est_b"),
        est_common.alias("est_common"),
    )
    return out.withColumn(
        "containment",
        F.when(
            F.col("est_a") > 0,
            decimal_round(F.col("est_common") / F.col("est_a"), 4),
        ).otherwise(F.lit(0.0)),
    )
