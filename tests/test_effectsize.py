"""cramers_v / odds_ratio (experiment.py), confusion_report
(evalmetrics.py) vs mirrors."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crgp_spark.operators.evalmetrics import confusion_report
from crgp_spark.operators.experiment import (
    chi2_independence,
    cramers_v,
    odds_ratio,
)


def test_cramers_v_consistency(spark):
    rows = [
        (u, ["a", "b", "c"][(u * 2 + k) % 3])
        for u in range(50)
        for k in range(2)
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    chi2 = chi2_independence(df).collect()[0].chi2
    r = cramers_v(df).collect()[0]
    n = len(rows)
    # V folds the RAW 8dp-quantized chi2 (ADVICE r4), not the
    # 4dp-rounded report — replicate the quantized integer fold
    counts = {}
    for u, et in rows:
        counts[(et, u % 2)] = counts.get((et, u % 2), 0) + 1
    rt = {}
    ct = {}
    for (cat, arm), c in counts.items():
        rt[cat] = rt.get(cat, 0) + c
        ct[arm] = ct.get(arm, 0) + c
    tq = 0
    for (cat, arm), c in counts.items():
        e = rt[cat] * ct[arm] / n
        tq += math.floor((c - e) * (c - e) / e * 1e8 + 0.5)
    chi2_raw = tq / 1e8
    want = math.floor(math.sqrt(chi2_raw / (n * 1)) * 1e6 + 0.5) / 1e6
    assert r.n == n and r.chi2 == chi2 and r.v == want


def test_cramers_v_independent_zero(spark):
    rows = [(u, et) for u in range(20) for et in ["a", "a", "b"]]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    assert cramers_v(df).collect()[0].v == 0.0


def test_odds_ratio_hand(spark):
    # arm1: 3 of 4 convert (a=3,b=1); arm0: 1 of 4 (c=1,d=3)
    rows = []
    for u, conv in [(1, 1), (3, 1), (5, 1), (7, 0), (0, 1), (2, 0), (4, 0), (6, 0)]:
        rows.append((u, "purchase" if conv else "view"))
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    r = odds_ratio(df).collect()[0]
    assert (r.a, r.b, r.c, r.d) == (3, 1, 1, 3)
    orv = 9.0
    se = math.sqrt(1 / 3 + 1 + 1 + 1 / 3)
    lo = math.exp(math.log(orv) - 1.96 * se)
    hi = math.exp(math.log(orv) + 1.96 * se)
    assert r.or_val == math.floor(orv * 1e6 + 0.5) / 1e6
    assert r.lo == math.floor(lo * 1e6 + 0.5) / 1e6
    assert r.hi == math.floor(hi * 1e6 + 0.5) / 1e6


def test_odds_ratio_zero_cell(spark):
    rows = [(u, "view") for u in range(8)]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    r = odds_ratio(df).collect()[0]
    assert r.or_val == 0.0 and r.lo == 0.0 and r.hi == 0.0


def test_confusion_report_mirror(spark):
    rows = [(i, (i * 7) % 100, 1 if (i * 3) % 5 < 2 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, "id: long, s: long, y: int")
    thr = 40
    tp = sum(1 for _, s, y in rows if s >= thr and y == 1)
    fp = sum(1 for _, s, y in rows if s >= thr and y == 0)
    fn = sum(1 for _, s, y in rows if s < thr and y == 1)
    tn = sum(1 for _, s, y in rows if s < thr and y == 0)
    r = confusion_report(df, "s", F.col("y") == 1, thr).collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    f1 = 2 * tp / (2 * tp + fp + fn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    for got, want in [(r.precision, prec), (r.recall, rec), (r.f1, f1), (r.mcc, mcc)]:
        assert got == math.floor(want * 1e6 + 0.5) / 1e6


def test_confusion_perfect(spark):
    rows = [(i, 90 + (i % 5), 1) for i in range(10)] + [
        (100 + i, i % 5, 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id: long, s: long, y: int")
    r = confusion_report(df, "s", F.col("y") == 1, 50).collect()[0]
    assert r.mcc == 1.0 and r.f1 == 1.0
