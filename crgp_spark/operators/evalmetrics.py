"""Classifier evaluation metrics — exact ROC-AUC and calibration
curves, the measurement companion to the training/inference pair
(``regress.py::train_logistic``, ``inference.py``): a curation
pipeline that trains quality classifiers needs to SCORE them, on-
cluster, over held-out corpus slices.  Standard statistics (Mann &
Whitney 1947; Hanley & McNeil 1982 for the AUC = U-statistic
identity; DeGroot & Fienberg 1983 for calibration) — public textbook
material, independently expressed.

Exactness device for AUC: the Mann-Whitney identity

    AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N)

with midrank tie handling.  Everything stays in BIGINTs by tracking
DOUBLED ranks: a tied score-group with ``cnt`` members starting at
1-based rank ``r_lo`` has midrank ``r_lo + (cnt−1)/2``, so its doubled
midrank ``2·r_lo + cnt − 1`` is always an integer.  Then

    S2  = Σ_groups pos_g · (2·r_lo_g + cnt_g − 1)     (= 2·Σ ranks⁺)
    U2  = S2 − P·(P+1)                                 (= 2·U)
    AUC = U2 / (2·P·N)                                 (ONE IEEE division)

— bit-identical cross-engine.

Scale shape: ranks are computed over SCORE GROUPS, not rows — one
map-side-combinable ``groupBy(score)`` then a cumulative window over
the distinct-score table (cardinality of the score domain, not the
corpus; a quantized model score has thousands of groups at any corpus
size).  No global per-row sort, no per-row Python.  Calibration is a
single partial-agg ``groupBy(bucket)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["roc_auc", "auc_from_groups", "calibration_curve"]


def roc_auc(
    df: DataFrame, score_col: str | Column, label_col: str | Column
) -> DataFrame:
    """One row ``(n_pos, n_neg, u2, auc)``: exact midrank Mann-Whitney
    AUC of ``score_col`` predicting boolean ``label_col`` (higher
    score ⇒ more likely positive).  ``u2`` is the doubled U statistic
    (exact integer); ``auc`` is one IEEE division of two BIGINTs."""
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    g = (
        df.select(score.alias("_s"), label.cast("long").alias("_y"))
        .where(F.col("_s").isNotNull())
        .groupBy("_s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("_y").cast("long").alias("pos"),
        )
    )
    return auc_from_groups(g)


def auc_from_groups(g: DataFrame) -> DataFrame:
    """The midrank fold over a pre-aggregated score-group table
    ``(_s, cnt, pos)`` — shared by the batch path and the streaming
    state-store drain (``streaming/windows.py::stream_roc_auc``):
    per-group (cnt, pos) are SUM monoids, so any partial grouping
    folds to the same statistic."""
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.select(
        "cnt",
        "pos",
        (F.lit(1) + F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .cast("long")
        .alias("r_lo"),
    )
    agg = ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("long").alias("n_neg"),
        F.sum(
            F.col("pos") * (2 * F.col("r_lo") + F.col("cnt") - 1)
        )
        .cast("long")
        .alias("_s2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        (F.col("_s2") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("long")
        .alias("u2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (
                F.col("_s2") - F.col("n_pos") * (F.col("n_pos") + 1)
            ).cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("auc"),
    )


def calibration_curve(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    bucket_width: int,
) -> DataFrame:
    """Reliability diagram over integer scores: per fixed-width score
    bucket, ``(bucket, n, n_pos, pos_rate)`` — counts exact BIGINTs,
    ``pos_rate`` one IEEE division (DeGroot-Fienberg binning)."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    return (
        df.select(
            score.cast("long").alias("_s"),
            label.cast("long").alias("_y"),
        )
        .where(F.col("_s").isNotNull())
        .select(
            F.expr(f"_s div {int(bucket_width)}").alias("bucket"), "_y"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_y").cast("long").alias("n_pos"),
        )
        .select(
            "bucket",
            "n",
            "n_pos",
            (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
                "pos_rate"
            ),
        )
    )


def confusion_report(
    scored: DataFrame,
    score_col: str,
    label_expr,
    threshold: int,
) -> DataFrame:
    """Thresholded classifier confusion report: one row ``(tp, fp,
    fn, tn, precision, recall, f1, mcc)`` over integer scores with
    prediction = ``score >= threshold`` — the operating-point
    companion to the threshold-free ``roc_auc`` / reliability curves.

    The four cells are exact BIGINTs from ONE conditional-sum
    aggregate (map-side combinable). Precision/recall/F1 are pinned
    divisions;

        MCC = (tp·tn − fp·fn) / sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn))

    is computed with the four marginal factors multiplied as DOUBLES
    (each marginal is an exact ≤2⁶³ integer cast once; their product
    would overflow int64 at n ≳ 56 k rows, so the multiplication
    lives in float — identical operand sequence in both engines).
    Degenerate marginals report 0 (the Matthews convention)."""
    y = F.when(label_expr, 1).otherwise(0)
    p = F.when(F.col(score_col) >= threshold, 1).otherwise(0)
    g = scored.agg(
        F.sum(F.when((p == 1) & (y == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when((p == 1) & (y == 0), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((p == 0) & (y == 1), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when((p == 0) & (y == 0), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    fd = lambda c: F.col(c).cast("double")  # noqa: E731
    prec_den = F.col("tp") + F.col("fp")
    rec_den = F.col("tp") + F.col("fn")
    prec = F.when(prec_den > 0, fd("tp") / prec_den.cast("double")).otherwise(
        F.lit(0.0)
    )
    rec = F.when(rec_den > 0, fd("tp") / rec_den.cast("double")).otherwise(
        F.lit(0.0)
    )
    f1_den = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    f1 = F.when(
        f1_den > 0, (F.lit(2.0) * fd("tp")) / f1_den.cast("double")
    ).otherwise(F.lit(0.0))
    m1 = (F.col("tp") + F.col("fp")).cast("double")
    m2 = (F.col("tp") + F.col("fn")).cast("double")
    m3 = (F.col("tn") + F.col("fp")).cast("double")
    m4 = (F.col("tn") + F.col("fn")).cast("double")
    mcc_num = (F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn")).cast(
        "double"
    )
    mcc = F.when(
        (m1 > 0) & (m2 > 0) & (m3 > 0) & (m4 > 0),
        mcc_num / F.sqrt(m1 * m2 * m3 * m4),
    ).otherwise(F.lit(0.0))
    from crgp_spark.functions import decimal_round

    return g.select(
        "tp",
        "fp",
        "fn",
        "tn",
        decimal_round(prec, 6).alias("precision"),
        decimal_round(rec, 6).alias("recall"),
        decimal_round(f1, 6).alias("f1"),
        decimal_round(mcc, 6).alias("mcc"),
    )
