"""Deterministic sampling for pipeline reproducibility.

``df.sample()`` is seed-dependent on PARTITIONING (Bernoulli per
partition split), so the same call over the same data repartitioned
differently returns different rows — useless for reproducible
training-data pipelines and impossible to oracle-check.  These
operators key the decision on a content hash instead: the sample is a
pure function of the ROW, stable under any partitioning, cluster size,
or engine (the md5-derived u32 is bit-identical in SQL), and
composable (the p% sample of a q% sample is the p·q/100% sample of
hash-disjoint bands).

Both are scan-shaped: the hash filter runs inside whole-stage codegen
(no shuffle at all); the stratified variant adds one per-stratum
window — partitioned, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_u32(expr: F.Column) -> F.Column:
    """First 4 md5 bytes as unsigned 32-bit — the engine's portable
    deterministic hash (same construction as multimodal.py/similarity.py,
    reproducible in any SQL dialect with md5)."""
    return F.conv(F.substring(F.md5(expr.cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )


def hash_sample(
    df: DataFrame, key: str, pct: int, seed: str = "s0"
) -> DataFrame:
    """Keep rows whose md5-u32 of ``seed:key`` falls in the first
    ``pct``% of the hash space. Exact expectation pct%, deterministic,
    partitioning-independent."""
    h = _md5_u32(F.concat(F.lit(seed + ":"), F.col(key).cast("string")))
    return df.filter(F.pmod(h, F.lit(100)) < pct)


def stratified_sample(
    df: DataFrame, stratum: str, key: str, n_per_stratum: int, seed: str = "s0"
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen by hash order — a deterministic uniform draw
    with a hard per-group cap, the idiom for balanced eval/train
    splits. Adds a ``rk`` rank column (hash order, key tie-break)."""
    h = _md5_u32(F.concat(F.lit(seed + ":"), F.col(key).cast("string")))
    w = Window.partitionBy(stratum).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= n_per_stratum)
    )


def weighted_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    weight_col: str,
    n_per_stratum: int,
    seed: str = "s0",
) -> DataFrame:
    """Weight-proportional sampling WITHOUT replacement by PRIORITY
    SAMPLING (Duffield-Lund-Thorup 2007): each row gets priority
    ``q = w / u`` with ``u = (h+1)/2^32`` its deterministic md5
    uniform; the sample is the top ``n_per_stratum`` priorities per
    stratum.  Returns the kept rows with ``(rk, priority, est)`` where
    ``est = max(w, tau)`` and ``tau`` is the (n+1)-th priority — the
    DLT estimator that makes SUM(est) over any kept subset an unbiased
    estimate of that subset's true weight sum (the property that lets
    a 100 TB pipeline sample first and aggregate later).

    Cross-engine exactness without logs: ``q = (w·2^32)/(h+1)`` is ONE
    correctly-rounded IEEE division of two exact integers (weights are
    validated <= 2^20 so ``w·2^32 < 2^53``), so every priority — and
    therefore the ranking, the threshold and the estimator — is
    bit-identical in any IEEE-754 engine.  No quantization epsilon,
    no float-summation order anywhere.

    Scale shape: one scan + one per-stratum window (partitioned,
    never global); the threshold recombines via a per-stratum
    broadcast-sized aggregate."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    w = F.col(weight_col).cast("long")
    h = _md5_u32(F.concat(F.lit(seed + ":"), F.col(key).cast("string")))
    bad = df.filter(
        F.col(weight_col).isNull()
        | (w <= 0)
        | (w > F.lit(1 << 20))
    )
    if bad.take(1):
        raise ValueError(
            f"weighted_sample: {weight_col} must be an integer in "
            "[1, 2^20] on every row (keeps w*2^32 exact as a double)"
        )
    pri = (w * F.lit(1 << 32)).cast("double") / (h + 1).cast("double")
    win = Window.partitionBy(stratum).orderBy(
        F.col("priority").desc(), F.col(key).asc()
    )
    ranked = df.select(
        F.col(stratum), F.col(key), w.alias("w"), pri.alias("priority")
    ).withColumn("rk", F.row_number().over(win).cast("int"))
    tau = ranked.filter(F.col("rk") == n_per_stratum + 1).groupBy(
        stratum
    ).agg(F.max("priority").alias("tau"))
    return (
        ranked.filter(F.col("rk") <= n_per_stratum)
        .join(F.broadcast(tau), stratum, "left")
        .select(
            stratum,
            key,
            "w",
            "rk",
            "priority",
            F.greatest(
                F.col("w").cast("double"), F.coalesce("tau", F.lit(0.0))
            ).alias("est"),
        )
    )


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    label_expr: F.Column | None = None,
) -> DataFrame:
    """Deterministic k-fold assignment report: every row gets fold
    ``md5_u32(key) % k`` (a pure function of the key — reproducible on
    retry, stable across engines, and GROUP-safe: all rows of one key
    land in one fold, the property random splits silently violate and
    the #1 source of train/test leakage). Returns the per-fold audit
    ``(fold, n_rows, n_keys, n_pos, pos_rate)`` — the balance check
    run before training; the assignment itself is the same expression
    applied to the full table.

    One grouped aggregate with map-side combine; ``pos_rate`` is one
    IEEE division per fold row at 6dp."""
    if k < 2:
        raise ValueError("k must be >= 2")
    lbl = label_expr if label_expr is not None else F.lit(0)
    rows = df.select(
        (_md5_u32(F.col(key_col).cast("string")) % k)
        .cast("int")
        .alias("fold"),
        F.col(key_col).alias("_k"),
        F.when(lbl == 1, 1).otherwise(0).alias("_y")
        if label_expr is not None
        else lbl.alias("_y"),
    )
    out = rows.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("_k").alias("n_keys"),
        F.sum("_y").cast("long").alias("n_pos"),
    )
    from crgp_spark.functions import decimal_round

    return out.select(
        "fold",
        "n_rows",
        "n_keys",
        "n_pos",
        decimal_round(
            F.col("n_pos").cast("double") / F.col("n_rows").cast("double"),
            6,
        ).alias("pos_rate"),
    ).orderBy("fold")
