"""Count-min sketch: mergeable frequency estimation + heavy hitters.

The frequency twin of the KMV distinct sketch (`sketch.py`): where KMV
answers "how many DISTINCT keys", count-min answers "how often does
key X occur" from the same fixed-size state.  The sketch is a d×w
counter grid — row r increments counter ``h_r(key) mod w`` — and the
point estimate is the MIN across the d rows, which can only
OVERESTIMATE (every row holds the true count plus non-negative
collision mass; Cormode & Muthukrishnan 2005).

Spark-first shape, all codegen:

- BUILD is one projection (the d bucket ids as an array literal of
  md5-derived hashes — the engine's `md5_num60` idiom, so the grid is
  bit-identical cross-engine) + posexplode + ``groupBy(row, bucket)``
  count: map-side combinable, one exchange of at most d·w rows per
  partition.  The grid is a commutative monoid — sketches from
  partitions, epochs, or table shards merge by adding counters, the
  same contract the KMV family ships.
- ESTIMATE broadcasts the d·w-row grid and joins the probe keys'
  exploded (row, bucket) pairs against it: no shuffle of the probed
  table, ``MIN(cnt)`` per key.

At 100 TB the grid is KBs regardless of input rows (w·d counters),
which is the entire point: exact per-key counts of a 10^12-row stream
need a full shuffle, the sketch needs one map-side pass.  Accuracy is
the classic ``est ≤ true + ε·N`` with ``ε = e/w`` at confidence
``1 − e^{−d}``; `heavy_hitters` surfaces est next to the exact count
so the driver gate verifies the deterministic half of the contract
(est ≥ true, and bit-equal grids) rather than asserting the
probabilistic half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import md5_num60


def _buckets(key, depth: int, width: int):
    return F.array(
        *[
            (
                md5_num60(F.concat(F.lit(f"{r}:"), key.cast("string")))
                % width
            ).alias(f"b{r}")
            for r in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the d×w grid: ``(row, bucket, cnt)`` — absent cells are 0."""
    if depth < 1 or width < 1:
        raise ValueError(f"need depth/width >= 1, got {depth}x{width}")
    return (
        df.select(
            F.posexplode(_buckets(F.col(key_col), depth, width)).alias(
                "row", "bucket"
            )
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two grids built with the same (depth, width, hash): add
    counters cell-wise — the commutative-monoid contract."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-estimate each probe key: ``(key, est)`` = MIN over the d
    rows of the key's counters.  The grid is broadcast (d·w rows); the
    probe table is never shuffled beyond its own groupBy."""
    ex = probes.select(
        F.col(key_col).alias("key"),
        F.posexplode(_buckets(F.col(key_col), depth, width)).alias(
            "row", "bucket"
        ),
    )
    return (
        ex.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est"))
        .select(F.col("key").alias(key_col), "est")
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 64,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Top-k keys by exact count, each with its count-min estimate:
    ``(key, exact, est, over_ok)``.  ``over_ok = est >= exact`` is the
    sketch's deterministic guarantee — surfaced so the gate checks it
    instead of trusting it.  Ties rank by key.

    ``sketch`` lets a caller supply a grid built elsewhere (a streaming
    drain, a merged shard union) — it must share (depth, width); the
    grid being a monoid means the result is identical however it was
    accumulated."""
    sk = sketch if sketch is not None else cms_sketch(df, key_col, depth, width)
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact"))
    top = (
        exact.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("exact"), F.col(key_col))
            ),
        )
        .where(F.col("rk") <= k)
        .drop("rk")
    )
    est = cms_estimate(sk, top.select(key_col), key_col, depth, width)
    return top.join(est, key_col).select(
        key_col,
        "exact",
        "est",
        (F.col("est") >= F.col("exact")).alias("over_ok"),
    )
