"""Kaplan-Meier survival estimator, integer-exact on the log scale.

Retention's canonical curve: with ``d_t`` observed events (churn) and
``n_t`` subjects still at risk at duration ``t``,

    S(t) = Π_{t'≤t} (1 − d_{t'} / n_{t'})

Censored subjects (still active at the end of the observation window)
leave the risk set without contributing an event — exactly the thing a
naive "fraction retained by day t" gets wrong.

The running product is float-hostile (association order, and engines
disagree in the last ulp), so the estimator is carried on the LOG
scale with the ``textstats._lnq`` quantized-ln contract:

    lnS_scaled(t) = Σ_{t'≤t, d>0} (lnq(n−d) − lnq(n))    (exact BIGINT)

— a cumulative integer sum, bit-identical in both engines. ``exp`` is
deliberately NOT applied (engines round it differently); callers
exponentiate client-side: ``S = exp(lnS_scaled / 10⁶)``. Where the
risk set is extinguished (``d = n``) the survival hits exact zero and
``lnS_scaled`` reports NULL from that duration on (log of zero), via a
cumulative flag — Spark's SUM-over-window ignores NULLs, so the flag
is load-bearing, not cosmetic.

Scale shape: one per-subject aggregate (data-sized, map-side
combinable), then everything runs on the DURATION GRID — distinct
duration values, bounded by the observation window in days, the
``pettitt_test`` metadata-sized-window posture. The reference has no
survival surface (``statistics.rs:17-131``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.operators.textstats import _lnq

__all__ = ["kaplan_meier"]


def kaplan_meier(
    subjects: DataFrame,
    dur_col: str = "dur",
    event_col: str = "ev",
) -> DataFrame:
    """KM curve over per-subject ``(dur_col, event_col)`` rows
    (``event_col`` 1 = event observed at that duration, 0 = censored
    there): one row per distinct duration ``(t, n_risk, d_events,
    c_censored, lns_scaled)`` ordered by ``t``; ``lns_scaled`` is
    ``ln S(t)`` in micro-nats (≤ 0), NULL once survival is exactly 0."""
    durs = subjects.groupBy(F.col(dur_col).alias("t")).agg(
        F.sum(F.col(event_col)).cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col(event_col)).cast("long").alias(
            "c_censored"
        ),
        F.count(F.lit(1)).alias("_m"),
    )
    tot = durs.agg(F.sum("_m").alias("_n"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = durs.join(F.broadcast(tot)).select(
        "t",
        "d_events",
        "c_censored",
        (
            F.col("_n") - F.coalesce(F.sum("_m").over(w_prev), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    )
    factor = F.when(
        (F.col("d_events") > 0)
        & (F.col("n_risk") > F.col("d_events")),
        _lnq(F.col("n_risk") - F.col("d_events"))
        - _lnq(F.col("n_risk")),
    ).otherwise(F.lit(0))
    dead = F.when(
        F.col("n_risk") <= F.col("d_events"), F.lit(1)
    ).otherwise(F.lit(0))
    curve = risk.select(
        "t",
        "n_risk",
        "d_events",
        "c_censored",
        F.sum(factor).over(w_run).cast("long").alias("_lns"),
        F.max(dead).over(w_run).alias("_z"),
    )
    return curve.select(
        "t",
        "n_risk",
        "d_events",
        "c_censored",
        F.when(F.col("_z") == 1, F.lit(None).cast("long"))
        .otherwise(F.col("_lns"))
        .alias("lns_scaled"),
    ).orderBy("t")
