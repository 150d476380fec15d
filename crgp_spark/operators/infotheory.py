"""Information-theoretic dependence and corpus-divergence measures on
the engine's quantized-ln exactness contract.

Float logs summed in float are association-order-dependent and
engine-ambiguous; the ``textstats._lnq`` idiom (ln quantized to BIGINT
micro-nats, where the quantization IS the definition) makes every sum
here an exact BIGINT in both engines, with only a handful of pinned
final float ops.

``mutual_information``: dependence between two categorical columns
(the effect-size companion to ``experiment.chi2_independence`` — chi2
says "is there dependence", MI says "how many nats of it"):

    mi_scaled = Σ_cells n_xy · (lnq(n·n_xy) − lnq(n_x·n_y))
    MI        = mi_scaled / (n · 10⁶)          (one IEEE division)
    NMI       = mi_scaled / sqrt(hx_scaled · hy_scaled)

with the marginal entropies ``h*_scaled = n·lnq(n) − Σ n_x·lnq(n_x)``
in the same micro-nat units (the ``token_entropy`` fold), so the
normalization is one pinned sqrt/division of exact integers.

``js_divergence``: symmetric, bounded [0, ln 2] distance between two
corpora's unigram distributions (the training-data drift probe —
"did this source's language shift between snapshots"):

    JSD = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),   m = (p+q)/2
    p/m = 2·a_t·B / (a_t·B + b_t·A)   (all-integer arguments!)

so ``sa_scaled = Σ_t a_t·(lnq(2·a_t·B) − lnq(a_t·B + b_t·A))`` and its
``sb`` twin are exact BIGINTs and JSD folds with three pinned float
ops. Overflow envelope: lnq arguments ≤ 2·max_count·total ≲ 10¹⁸ and
the weighted sums ≤ total·ln(10¹⁸)·10⁶ ≈ total·4·10⁷ — int64-safe to
~10¹¹ tokens per corpus; both engines fail loudly beyond.

Plan shape: one groupBy per contingency/vocabulary key with map-side
combine, broadcast marginals, a 1-row fold. Scan-speed; no windows.
Reference scope ends at cascade counters (``statistics.rs:17-131``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, WindowSpec  # noqa: F401
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round
from crgp_spark.operators.textstats import _lnq, normalize_text, tokens

__all__ = ["mutual_information", "js_divergence"]


def mutual_information(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """One row ``(n, mi_scaled, hx_scaled, hy_scaled, mi, nmi)`` over
    the categorical pair ``(x_col, y_col)``."""
    cells = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count(F.lit(1)).alias("nxy"))
    mx = cells.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").alias("ny"))
    tot = cells.agg(F.sum("nxy").alias("n"))
    j = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .join(F.broadcast(tot))
    )
    mi_scaled = F.sum(
        F.col("nxy")
        * (
            _lnq(F.col("n") * F.col("nxy"))
            - _lnq(F.col("nx") * F.col("ny"))
        )
    ).cast("long")
    g = j.agg(
        F.max("n").alias("n"),
        mi_scaled.alias("mi_scaled"),
    )
    hx = mx.join(F.broadcast(tot)).agg(
        (
            F.max(F.col("n") * _lnq(F.col("n")))
            - F.sum(F.col("nx") * _lnq(F.col("nx")))
        )
        .cast("long")
        .alias("hx_scaled")
    )
    hy = my.join(F.broadcast(tot)).agg(
        (
            F.max(F.col("n") * _lnq(F.col("n")))
            - F.sum(F.col("ny") * _lnq(F.col("ny")))
        )
        .cast("long")
        .alias("hy_scaled")
    )
    out = g.join(F.broadcast(hx)).join(F.broadcast(hy))
    mi = F.col("mi_scaled").cast("double") / (
        F.col("n").cast("double") * F.lit(1e6)
    )
    nmi = F.when(
        (F.col("hx_scaled") > 0) & (F.col("hy_scaled") > 0),
        F.col("mi_scaled").cast("double")
        / F.sqrt(
            F.col("hx_scaled").cast("double")
            * F.col("hy_scaled").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    return out.select(
        "n",
        "mi_scaled",
        "hx_scaled",
        "hy_scaled",
        decimal_round(mi, 6).alias("mi"),
        decimal_round(nmi, 6).alias("nmi"),
    )


def js_divergence(
    docs: DataFrame,
    split_expr,
    text_col: str = "text",
) -> DataFrame:
    """One row ``(n_a, n_b, sa_scaled, sb_scaled, jsd)`` between the
    unigram distributions of the ``split_expr``-true corpus (A) and
    the rest (B); ``jsd`` in nats at 6dp, 0 ≤ jsd ≤ ln 2."""
    toks = docs.select(
        F.when(split_expr, F.lit(1)).otherwise(F.lit(0)).alias("side"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("term").agg(
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("b"),
    )
    tot = tf.agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    j = tf.join(F.broadcast(tot))
    sa = F.sum(
        F.when(
            F.col("a") > 0,
            F.col("a")
            * (
                _lnq(F.lit(2) * F.col("a") * F.col("nb"))
                - _lnq(
                    F.col("a") * F.col("nb") + F.col("b") * F.col("na")
                )
            ),
        ).otherwise(F.lit(0))
    ).cast("long")
    sb = F.sum(
        F.when(
            F.col("b") > 0,
            F.col("b")
            * (
                _lnq(F.lit(2) * F.col("b") * F.col("na"))
                - _lnq(
                    F.col("a") * F.col("nb") + F.col("b") * F.col("na")
                )
            ),
        ).otherwise(F.lit(0))
    ).cast("long")
    g = j.agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        sa.alias("sa_scaled"),
        sb.alias("sb_scaled"),
    )
    jsd = (
        F.col("sa_scaled").cast("double")
        / (F.lit(2e6) * F.col("n_a").cast("double"))
        + F.col("sb_scaled").cast("double")
        / (F.lit(2e6) * F.col("n_b").cast("double"))
    )
    return g.select(
        "n_a",
        "n_b",
        "sa_scaled",
        "sb_scaled",
        decimal_round(
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0), jsd
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("jsd"),
    )


def psi(
    base: DataFrame,
    current: DataFrame,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Population stability index between a baseline and a current
    bucketed distribution — the model-monitoring drift alarm
    (PSI < 0.1 stable, > 0.25 shifted):

        PSI = Σ_i (p_i − q_i) · ln(p_i / q_i)

    With integer bucket counts ``a_i`` (base, total A) and ``b_i``
    (current, total B): ``ln(p/q) = ln(a·B) − ln(b·A)`` — all-integer
    lnq arguments — and the weighted sum splits into two exact BIGINT
    folds ``Σ a·Δlnq`` and ``Σ b·Δlnq`` combined with two pinned
    divisions. Buckets missing on either side get the standard +1
    count smoothing (documented, part of the definition here — PSI is
    undefined at zero mass). Returns one row
    ``(n_base, n_cur, sa_scaled, sb_scaled, psi)``."""
    a = base.groupBy(F.col(bucket_col).alias("k")).agg(
        F.count(F.lit(1)).alias("a0")
    )
    b = current.groupBy(F.col(bucket_col).alias("k")).agg(
        F.count(F.lit(1)).alias("b0")
    )
    cells = (
        a.join(b, "k", "full")
        .select(
            "k",
            (F.coalesce("a0", F.lit(0)) + F.lit(1)).alias("a"),
            (F.coalesce("b0", F.lit(0)) + F.lit(1)).alias("b"),
        )
    )
    tot = cells.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    j = cells.join(F.broadcast(tot))
    dln = _lnq(F.col("a") * F.col("nb")) - _lnq(
        F.col("b") * F.col("na")
    )
    g = j.agg(
        F.max("na").alias("n_base"),
        F.max("nb").alias("n_cur"),
        F.sum(F.col("a") * dln).cast("long").alias("sa_scaled"),
        F.sum(F.col("b") * dln).cast("long").alias("sb_scaled"),
    )
    val = (
        F.col("sa_scaled").cast("double")
        / (F.lit(1e6) * F.col("n_base").cast("double"))
        - F.col("sb_scaled").cast("double")
        / (F.lit(1e6) * F.col("n_cur").cast("double"))
    )
    return g.select(
        "n_base",
        "n_cur",
        "sa_scaled",
        "sb_scaled",
        decimal_round(val, 6).alias("psi"),
    )
