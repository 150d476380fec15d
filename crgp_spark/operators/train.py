"""Distributed full-batch logistic training — the learning step the
pipeline's `inference.py` scores with.

A real deployment runs SGD via an ML framework; what a DATA ENGINE owes
that loop is the distributed part: computing the exact full-batch
gradient of a linear model over hashed features as aggregates, and
folding it into a weight table, round after round.  That shape — score
(broadcast weights into the feature table), residual, gradient
(groupBy feature index), update — is one map-side-combinable exchange
per phase regardless of row count, which is exactly how a 100 TB
full-batch pass distributes (the gradient is a d-vector: tiny; the
data never moves).

Everything is INTEGER so the result is bit-identical across engines
and row orders (float gradient sums are order-dependent — the same
reason `experiment.py` pins its expression order):

- features: ``encode.feature_hash`` signed indices (pure JVM md5);
- weights: integers in units of ``1/w_scale``;
- probability: the fast sigmoid of `inference.py`, quantized to
  ``1/q`` units with positive-operand integer division
  ``p_q = (q·(s+|z|+z)) div (2·(s+|z|))`` — no libm ``exp``, no
  negative-division ambiguity;
- gradient: ``g_j = Σ (p_q − y·q)·sign`` — an exact integer sum;
- update: ``w_j −= sgn(g_j)·((lr_num·|g_j|·w_scale) div
  (lr_den·n_rows·q))`` — truncation spelled out with ABS/SIGN so
  Spark's ``div`` and the oracle's ``//`` agree on every sign.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crgp_spark.operators.encode import feature_hash


def logistic_train(
    df: DataFrame,
    cols: Sequence[str],
    label_col: str,
    id_col: str,
    dim: int = 16,
    rounds: int = 3,
    lr_num: int = 1,
    lr_den: int = 4,
    q: int = 10_000,
    w_scale: int = 1000,
) -> DataFrame:
    """Run ``rounds`` full-batch gradient steps from zero weights;
    returns the final weight table ``(j, w)`` (``dim`` rows, ``w`` in
    integer ``1/w_scale`` units).  ``label_col`` must be 0/1."""
    if rounds < 1:
        raise ValueError(f"need rounds >= 1, got {rounds}")
    if min(lr_num, lr_den, q, w_scale) < 1:
        raise ValueError("lr_num, lr_den, q, w_scale must be >= 1")
    spark = df.sparkSession
    hashed = feature_hash(df, cols, dim=dim)
    f = hashed.select(
        F.col(id_col).alias("row_id"),
        F.col(label_col).cast("long").alias("y"),
        F.explode(F.arrays_zip("fh_idx", "fh_sign")).alias("fs"),
    ).select(
        "row_id",
        "y",
        F.col("fs.fh_idx").cast("long").alias("j"),
        F.col("fs.fh_sign").cast("long").alias("sgn"),
    )
    f = f.localCheckpoint(eager=True)  # reused 2x per round
    # 1-row aggregate folded in via broadcast cross-join — the
    # engine's no-collect scalar idiom
    n = df.select(F.count(F.lit(1)).cast("long").alias("n_rows"))
    w = spark.range(dim).select(
        F.col("id").alias("j"), F.lit(0).cast("long").alias("w")
    )
    for _ in range(rounds):
        z = (
            f.join(F.broadcast(w), "j")
            .groupBy("row_id", "y")
            .agg(F.sum(F.col("sgn") * F.col("w")).alias("z"))
        )
        p_q = F.expr(
            f"CAST({q} AS BIGINT) * ({w_scale} + abs(z) + z) "
            f"div (2 * ({w_scale} + abs(z)))"
        )
        err = z.select(
            "row_id", (p_q - F.col("y") * q).cast("long").alias("err")
        )
        g = (
            f.join(err, "row_id")
            .groupBy("j")
            .agg(F.sum(F.col("err") * F.col("sgn")).alias("g"))
        )
        upd = (
            w.join(F.broadcast(g), "j", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "j",
                (
                    F.col("w")
                    - F.signum(F.coalesce(F.col("g"), F.lit(0))).cast("long")
                    * F.expr(
                        f"({lr_num} * abs(coalesce(g, 0)) * {w_scale}) "
                        f"div ({lr_den} * n_rows * {q})"
                    )
                ).alias("w"),
            )
        )
        w = upd.localCheckpoint(eager=True)
    return w.select("j", "w")
