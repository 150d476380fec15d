"""Grouped ordinary-least-squares trend: one linear slope per key —
the "is this metric drifting?" primitive behind per-user engagement
trends, per-table growth curves, per-shard throughput regressions.

All moments are exact BIGINT sums in ONE combinable groupBy; the only
float op is the final ``num/den`` division of two exact integers,
which IEEE-754 rounds identically in Spark and DuckDB (same operands,
one correctly-rounded op) — so the oracle twin matches bit-for-bit
without any rounding idiom.

x is rebased per key (``x - min(x)``) before the moment sums: the
slope is shift-invariant, and rebasing keeps the overflow envelope
tight — with per-key spans ``x' <= S`` and ``|y| <= Y`` the worst
term is ``n·Σx'y <= n²·S·Y``, e.g. n=10⁴ observations over a 10³
span of 10⁶-cent values stays below 10¹⁷ < 2⁶³ (the
`anomaly.py`-style documented envelope; callers with wilder scales
pre-bucket x or y).  One exchange on the key serves both the rebase
window and the moment groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_trend(df: DataFrame, key: str, x: Column, y: Column) -> DataFrame:
    """Per-``key`` OLS fit of ``y`` on ``x`` (both integer-valued
    columns): returns ``(key, n, num, den, slope)`` where
    ``slope = num/den = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` — the exact
    integer numerator/denominator are kept alongside the float slope;
    ``slope`` is NULL when all x in a group are equal (den = 0)."""
    w = Window.partitionBy(key)
    reb = df.select(
        F.col(key), x.cast("long").alias("_x0"), y.cast("long").alias("_y")
    ).withColumn("_x", F.col("_x0") - F.min("_x0").over(w))
    s = reb.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    num = F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        den == 0, F.lit(None).cast("double")
    ).otherwise(num.cast("double") / den.cast("double"))
    return s.select(
        key,
        "n",
        num.alias("num"),
        den.alias("den"),
        slope.alias("slope"),
    )


def grouped_acf(
    df: DataFrame,
    key: str,
    order: list[Column],
    y: Column,
    lags: int = 3,
) -> DataFrame:
    """Per-``key`` sample autocorrelation of integer series ``y``
    (ordered within the key by ``order``) at lags ``1..lags`` — the
    seasonality/drift detector next to `grouped_trend`.

    Exact-integer idiom: the mean never materializes. With ``S = Σy``,
    ``SS = Σy²``, ``n`` per key and per-lag pair sums ``m = n - k``,
    ``syy = Σ y_t·y_{t+k}``, ``sy2 = Σ (y_t + y_{t+k})``, the lag-k
    autocovariance and variance cross-multiplied by ``n²`` are::

        num_k = n²·syy − n·S·sy2 + m·S²        (BIGINT exact)
        den   = n²·SS  − n·S²                  (BIGINT exact)

    and ``r_k = num_k / den`` is ONE IEEE division of two exact
    integers — bit-stable across engines, no rounding idiom needed
    (same contract as `grouped_trend`). ``y`` is rebased by the
    per-key MIN first (autocorrelation is shift-invariant), keeping
    the overflow envelope at ``n³·R²`` for value range ``R``: e.g.
    n = 10⁴ points of 10⁴-range values is 10¹² · 10⁸ = 10²⁰ — too
    hot, so callers with long series pre-bucket y (the documented
    `anomaly.py`-style envelope); n = 10³, R = 10⁴ stays at 10¹⁷.

    Plan: ONE window pass computes every lead (one exchange on
    ``key``), the lag column explodes from a literal array (no
    re-shuffle — ``key`` partitioning is preserved), and both the
    pair sums and the total moments are map-side-combinable
    aggregates re-joined on the same key partitioning.

    Returns ``(key, lag, m, num, den, r)``; ``r`` is NULL for
    constant series (den = 0); lags ≥ n yield no row (no pairs).
    """
    w = Window.partitionBy(key).orderBy(*order)
    reb = df.select(
        F.col(key), y.cast("long").alias("_y0"), *order
    ).withColumn(
        "_y", F.col("_y0") - F.min("_y0").over(Window.partitionBy(key))
    )
    led = (
        reb.select(
            key,
            "_y",
            *[
                F.lead("_y", k).over(w).alias(f"_yl{k}")
                for k in range(1, lags + 1)
            ],
        )
        .select(
            key,
            "_y",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("lag"),
                            F.col(f"_yl{k}").alias("_yl"),
                        )
                        for k in range(1, lags + 1)
                    ]
                )
            ).alias("p"),
        )
        .select(
            key, "_y", F.col("p.lag").alias("lag"), F.col("p._yl").alias("_yl")
        )
    )
    pair = (
        led.filter(F.col("_yl").isNotNull())
        .groupBy(key, "lag")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("_y") * F.col("_yl")).alias("_syy"),
            F.sum(F.col("_y") + F.col("_yl")).alias("_sy2"),
        )
    )
    tot = reb.groupBy(key).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").alias("_s"),
        F.sum(F.col("_y") * F.col("_y")).alias("_ss"),
    )
    j = pair.join(tot, key)
    num = (
        F.col("_n") * F.col("_n") * F.col("_syy")
        - F.col("_n") * F.col("_s") * F.col("_sy2")
        + F.col("m") * F.col("_s") * F.col("_s")
    )
    den = F.col("_n") * F.col("_n") * F.col("_ss") - F.col("_n") * F.col(
        "_s"
    ) * F.col("_s")
    r = F.when(den == 0, F.lit(None).cast("double")).otherwise(
        num.cast("double") / den.cast("double")
    )
    return j.select(
        key,
        "lag",
        "m",
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
        r.alias("r"),
    )


def theil_sen(
    df: DataFrame, key: str, x_col: str, y_col: str
) -> DataFrame:
    """Theil-Sen robust trend per group: slope = MEDIAN of all pairwise
    slopes (breakdown point 29%, immune to the outliers that drag OLS),
    intercept = MEDIAN of ``y - slope·x``.  Returns ``(key, n_pairs,
    slope, intercept)``; groups with fewer than 2 distinct x drop out
    (no pair has a defined slope).

    Cross-engine exactness: inputs are integers, each pairwise slope is
    ONE IEEE division of exact integers (bit-identical), and a median
    is an order statistic of that multiset — unique VALUES regardless
    of how either engine breaks sort ties — with the even-count middle
    pair averaged by one add + one halving.  The intercept residuals
    are two more IEEE ops on identical doubles.  No float summation
    order anywhere.

    Scale shape: the pair join is per-group quadratic — the honest
    Theil-Sen cost, sized for per-key metric series (the grouped-ACF
    envelope: thousands of points per key, never corpus-wide); both
    medians are per-group windows, partitioned, never global."""
    base = df.select(
        F.col(key).alias("k"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b, (F.col("a.k") == F.col("b.k")) & (F.col("a.x") < F.col("b.x"))
    ).select(
        F.col("a.k").alias("k"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )

    def _median(vals: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("k").orderBy(col)
        ranked = vals.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy("k"))
        )
        lo, hi = F.expr("(_n + 1) div 2"), F.expr("_n div 2 + 1")
        mid = ranked.where((F.col("_rn") == lo) | (F.col("_rn") == hi))
        return mid.groupBy("k").agg(
            F.max("_n").cast("long").alias("_cnt"),
            F.avg(col).alias(f"med_{col}"),
        )

    med_s = _median(pairs, "slope").withColumnRenamed("_cnt", "n_pairs")
    resid = base.join(F.broadcast(med_s), "k").select(
        "k",
        (
            F.col("y").cast("double")
            - F.col("med_slope") * F.col("x").cast("double")
        ).alias("resid"),
    )
    med_i = _median(resid, "resid").drop("_cnt")
    return (
        med_s.join(med_i, "k")
        .select(
            F.col("k").alias(key),
            "n_pairs",
            F.col("med_slope").alias("slope"),
            F.col("med_resid").alias("intercept"),
        )
    )


def mann_kendall(
    series: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """Mann-Kendall trend test over an ordered series with unique
    ``t_col``: one row ``(n, s, var18, z)`` where

        S     = Σ_{i<j} sgn(x_j − x_i)                     (BIGINT)
        var18 = n(n−1)(2n+5) − Σ_ties g(g−1)(2g+5)         (BIGINT;
                Var(S) = var18/18, the Kendall tie correction)
        z     = (S∓1)/sqrt(var18/18)  (continuity-corrected, 0 at S=0)

    — the nonparametric "is there a monotone trend" companion to
    ``theil_sen`` (which estimates the slope this test scores). S is
    an exact pair fold over the series GRID (one self-join with
    ``t_i < t_j``): quadratic in grid length, which is the metadata-
    sized daily/hourly axis, never event volume — the same posture as
    ``theil_sen``'s pair median. The only float math is the one pinned
    sqrt/division expression at 6dp."""
    a = series.select(
        F.col(t_col).alias("_ta"), F.col(x_col).alias("_xa")
    )
    b = series.select(
        F.col(t_col).alias("_tb"), F.col(x_col).alias("_xb")
    )
    s_df = (
        a.join(b, F.col("_ta") < F.col("_tb"))
        .agg(
            F.sum(
                F.signum(
                    (F.col("_xb") - F.col("_xa")).cast("double")
                ).cast("long")
            ).alias("s")
        )
        .select(F.coalesce("s", F.lit(0)).alias("s"))
    )
    nn = series.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        series.groupBy(x_col)
        .agg(F.count(F.lit(1)).alias("g"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("g")
                    * (F.col("g") - 1)
                    * (2 * F.col("g") + 5)
                ),
                F.lit(0),
            ).alias("tie18")
        )
    )
    j = nn.join(F.broadcast(s_df)).join(F.broadcast(ties))
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie18")
    ).cast("long")
    sd = F.sqrt(var18.cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double") / sd)
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    from crgp_spark.functions import decimal_round

    return j.select(
        "n",
        "s",
        var18.alias("var18"),
        decimal_round(
            F.when(var18 > 0, z).otherwise(F.lit(0.0)), 6
        ).alias("z"),
    )


def kendall_tau(
    series: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Kendall tau-b between two aligned series over the same grid:
    one row ``(n, nc, nd, tx, ty, tau)`` with concordant/discordant
    pair counts and the tie terms

        tau_b = (nc − nd) / sqrt((n0 − tx)·(n0 − ty)),  n0 = n(n−1)/2

    — all BIGINTs from ONE pair fold over the grid self-join
    (``mann_kendall``'s posture: quadratic in the metadata-sized grid,
    never in event volume), one pinned sqrt/division at 6dp.
    Completes the correlation family: Pearson (``grouped_trend``
    moments), Spearman (``rankcorr``), tau-b here."""
    a = series.select(
        F.col(t_col).alias("_ta"),
        F.col(x_col).alias("_xa"),
        F.col(y_col).alias("_ya"),
    )
    b = series.select(
        F.col(t_col).alias("_tb"),
        F.col(x_col).alias("_xb"),
        F.col(y_col).alias("_yb"),
    )
    sx = F.signum((F.col("_xb") - F.col("_xa")).cast("double"))
    sy = F.signum((F.col("_yb") - F.col("_ya")).cast("double"))
    p = a.join(b, F.col("_ta") < F.col("_tb")).select(
        (sx * sy).cast("long").alias("prod"),
        (sx == 0).cast("long").alias("tiex"),
        (sy == 0).cast("long").alias("tiey"),
    )
    g = p.agg(
        F.coalesce(
            F.sum(F.when(F.col("prod") > 0, 1).otherwise(0)), F.lit(0)
        ).alias("nc"),
        F.coalesce(
            F.sum(F.when(F.col("prod") < 0, 1).otherwise(0)), F.lit(0)
        ).alias("nd"),
        F.coalesce(F.sum("tiex"), F.lit(0)).alias("tx"),
        F.coalesce(F.sum("tiey"), F.lit(0)).alias("ty"),
    )
    nn = series.agg(F.count(F.lit(1)).alias("n"))
    j = nn.join(F.broadcast(g))
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    denx = (n0 - F.col("tx")).cast("double")
    deny = (n0 - F.col("ty")).cast("double")
    tau = F.when(
        (denx > 0) & (deny > 0),
        (F.col("nc") - F.col("nd")).cast("double")
        / F.sqrt(denx * deny),
    ).otherwise(F.lit(0.0))
    from crgp_spark.functions import decimal_round

    return j.select(
        "n",
        "nc",
        "nd",
        "tx",
        "ty",
        decimal_round(tau, 6).alias("tau"),
    )
