"""Deterministic exact-quota stratified sampling.

The training-data mixing step after `transitions.py::mixture_manifest`
DECIDES rates: actually drawing "exactly ``quota`` documents per
source, reproducibly, engine-independently" at corpus scale. Random
sampling (``df.sample``) is neither exact nor cross-engine
reproducible; a global per-stratum ``row_number`` over a hash order is
exact but sorts WHOLE strata through single reducers — the classic
scale trap for a 100 TB corpus with a handful of sources.

The engine's shape is the two-level idiom (`seqpack`/`skyline`
precedent), selecting the ``quota`` smallest ``(md5(key), key)`` values
per stratum without ever sorting a stratum:

1. hash order: ``ord = md5_num60(key)`` (the engine-wide
   deterministic cross-engine hash, `functions.md5_num60`), bucket =
   top ``log2(n_buckets)`` bits — bucket order IS ord order across
   buckets, which is what makes the split exact;
2. ONE map-side-combinable ``groupBy(strata, bucket)`` count — a
   metadata-sized table (strata × n_buckets rows);
3. per stratum, a window over that tiny table finds the boundary
   bucket ``b*`` where the cumulative count crosses ``quota``:
   buckets below ``b*`` are kept WHOLESALE (no per-row ranking),
   buckets above are dropped wholesale;
4. only the boundary bucket — expected ``n_stratum / n_buckets`` rows
   — pays a per-row ``row_number`` for the remaining
   ``quota - cum(b*-1)`` slots, tie-broken by ``(ord, key)``.

The per-row work is one hash + one broadcast threshold join + a window
over 1/``n_buckets`` of the data; raise ``n_buckets`` to shrink the
ranked slice at larger scale. Exactness: ord values in different
buckets never interleave, so wholesale-kept rows are precisely the
global top ranks — the oracle's naive per-stratum
``ROW_NUMBER() <= quota`` over the full sort agrees row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import md5_num60


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    quota: int,
    key_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Exactly ``min(quota, n_stratum)`` rows per stratum, chosen as
    the ``quota`` smallest ``(md5_num60(key), key)`` values — a
    deterministic, engine-independent uniform draw. ``key_col`` must be
    unique per row (it is the tie-break); ``n_buckets`` must be a
    power of two ≤ 2^60."""
    if quota <= 0:
        raise ValueError(f"stratified_sample: quota must be > 0, got {quota}")
    if n_buckets & (n_buckets - 1) or not 0 < n_buckets <= 1 << 60:
        raise ValueError(
            f"stratified_sample: n_buckets must be a power of two, got "
            f"{n_buckets}"
        )
    shift = 60 - n_buckets.bit_length() + 1  # 2^k buckets -> shift 60-k
    cols = df.columns
    d = df.withColumn(
        "_ord", md5_num60(F.col(key_col).cast("string"))
    ).withColumn("_bkt", F.shiftrightunsigned("_ord", shift))

    counts = d.groupBy(*strata_cols, "_bkt").agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = (
        Window.partitionBy(*strata_cols)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("_cum", F.sum("_n").over(w))
    # boundary bucket per stratum: the first whose cumulative count
    # reaches the quota (absent when the stratum is smaller than the
    # quota — then everything is kept)
    thr = (
        cum.filter(F.col("_cum") >= quota)
        .groupBy(*strata_cols)
        .agg(
            F.min("_bkt").alias("_bstar"),
            F.min_by(F.col("_cum") - F.col("_n"), "_bkt").alias("_before"),
        )
    )

    d2 = d.join(F.broadcast(thr), strata_cols, "left")
    whole = d2.filter(
        F.col("_bstar").isNull() | (F.col("_bkt") < F.col("_bstar"))
    ).select(*cols)
    wb = Window.partitionBy(*strata_cols).orderBy("_ord", key_col)
    boundary = (
        d2.filter(F.col("_bkt") == F.col("_bstar"))
        .withColumn("_rk", F.row_number().over(wb))
        .filter(F.col("_rk") <= F.lit(quota) - F.col("_before"))
        .select(*cols)
    )
    return whole.unionByName(boundary)
