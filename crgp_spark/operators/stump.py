"""Exact decision-stump training (depth-1 CART) over integer features.

The first rung of tree-based modeling — and the interpretable
"which single feature splits this label best" readout behind feature
triage for the quality-classifier pipeline (``train.py`` fits the
logistic once features are chosen; the stump ranks them).

For every feature and every candidate threshold t (distinct feature
value), the split ``f ≤ t`` is scored by weighted Gini purity.
Minimizing impurity is equivalent to maximizing

    score = ΣcL²/nL + ΣcR²/nR
          = (ΣcL²·nR + ΣcR²·nL) / (nL·nR)

with ΣcS² = xS² + (nS−xS)² for a binary label — all BIGINTs built
from ONE value-level aggregate per feature plus a per-feature
cumulative window (value-grid-sized, never row-sized). The score is
ONE IEEE division of the two exact integers — identical operands,
one correctly-rounded op, so the double is bit-identical across
engines (the ``grouped_trend`` contract); a fixed-point multiply
would overflow int64 at ``a ≈ n³/4``. The argmax is the pinned total
order ``(score desc, feature, threshold)`` on that deterministic
double with integer tiebreaks. Integer-side envelope: ``a < 2⁶³``
needs n ≲ 3·10⁶ labeled rows per stump; both engines fail loudly
beyond (sample or pre-bucket above it, the ``mixing_stats`` posture).

Plan shape: one narrow melt (union of per-feature projections — scan
reuse, no shuffle), one groupBy (feature, value) with map-side
combine, per-feature windows over the value grid, one
TakeOrderedAndProject for the winner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["stump_train"]


def stump_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
) -> DataFrame:
    """Best depth-1 split over integer ``feature_cols`` for binary
    ``label_col`` (0/1): one row ``(feature, threshold, score,
    n_left, pos_left, n_right, pos_right)``. Thresholds with an empty
    side are excluded (no split)."""
    if not feature_cols:
        raise ValueError("need at least one feature column")
    melted = None
    for f in feature_cols:
        part = df.select(
            F.lit(f).alias("feature"),
            F.col(f).cast("long").alias("v"),
            F.col(label_col).cast("long").alias("y"),
        )
        melted = part if melted is None else melted.unionByName(part)
    cells = melted.groupBy("feature", "v").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("y").alias("x"),
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("feature")
    cum = cells.select(
        "feature",
        F.col("v").alias("threshold"),
        F.sum("c").over(w).alias("nl"),
        F.sum("x").over(w).alias("xl"),
        F.sum("c").over(wtot).alias("n"),
        F.sum("x").over(wtot).alias("x"),
    )
    split = cum.select(
        "feature",
        "threshold",
        F.col("nl").alias("n_left"),
        F.col("xl").alias("pos_left"),
        (F.col("n") - F.col("nl")).alias("n_right"),
        (F.col("x") - F.col("xl")).alias("pos_right"),
    ).filter((F.col("n_left") > 0) & (F.col("n_right") > 0))
    sl = (
        F.col("pos_left") * F.col("pos_left")
        + (F.col("n_left") - F.col("pos_left"))
        * (F.col("n_left") - F.col("pos_left"))
    )
    sr = (
        F.col("pos_right") * F.col("pos_right")
        + (F.col("n_right") - F.col("pos_right"))
        * (F.col("n_right") - F.col("pos_right"))
    )
    a = sl * F.col("n_right") + sr * F.col("n_left")
    b = F.col("n_left") * F.col("n_right")
    scored = split.select(
        "feature",
        "threshold",
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        (a.cast("double") / b.cast("double")).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), "feature", "threshold")
        .limit(1)
        .select(
            "feature",
            "threshold",
            "score",
            "n_left",
            "pos_left",
            "n_right",
            "pos_right",
        )
    )
