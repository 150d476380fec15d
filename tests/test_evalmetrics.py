"""ROC-AUC and calibration: sklearn-free hand checks — perfect
separation, random-ish ties, midrank parity vs a brute-force python
Mann-Whitney."""

from __future__ import annotations

from crgp_spark.operators.evalmetrics import calibration_curve, roc_auc


def _brute_auc(pairs):
    # midrank Mann-Whitney, O(n^2) reference
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    return num / (len(pos) * len(neg))


def test_perfect_and_inverted(spark):
    rows = [(10, 1), (9, 1), (2, 0), (1, 0)]
    df = spark.createDataFrame(rows, "s long, y long")
    r = roc_auc(df, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 1.0)
    inv = spark.createDataFrame([(s, 1 - y) for s, y in rows],
                                "s long, y long")
    assert roc_auc(inv, "s", "y").collect()[0]["auc"] == 0.0


def test_midrank_ties_match_bruteforce(spark):
    pairs = [(5, 1), (5, 0), (3, 1), (3, 0), (3, 1), (8, 0), (1, 0),
             (8, 1), (5, 1), (2, 0), (9, 1), (2, 1)]
    df = spark.createDataFrame(pairs, "s long, y long")
    r = roc_auc(df, "s", "y").collect()[0]
    want = _brute_auc(pairs)
    assert abs(r["auc"] - want) < 1e-12
    # u2 is the exact doubled U statistic
    assert r["u2"] == round(2 * want * r["n_pos"] * r["n_neg"])


def test_calibration_buckets(spark):
    rows = [(0, 0), (5, 0), (12, 1), (17, 0), (23, 1), (27, 1)]
    df = spark.createDataFrame(rows, "s long, y long")
    got = {r["bucket"]: (r["n"], r["n_pos"], r["pos_rate"])
           for r in calibration_curve(df, "s", "y", 10).collect()}
    assert got == {0: (2, 0, 0.0), 1: (2, 1, 0.5), 2: (2, 2, 1.0)}
