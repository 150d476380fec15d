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
