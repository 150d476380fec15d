"""stump_train (stump.py) and prop_test (experiment.py) vs mirrors."""

from __future__ import annotations

import math
from collections import defaultdict

from crgp_spark.operators.experiment import prop_test
from crgp_spark.operators.stump import stump_train

def _stump_ref(rows, feats):
    best = None
    for f_i, f in enumerate(feats):
        cells = defaultdict(lambda: [0, 0])
        for r in rows:
            cells[r[f_i]][0] += 1
            cells[r[f_i]][1] += r[-1]
        vals = sorted(cells)
        n = sum(c for c, _ in cells.values())
        x = sum(p for _, p in cells.values())
        nl = xl = 0
        for v in vals:
            nl += cells[v][0]
            xl += cells[v][1]
            nr, xr = n - nl, x - xl
            if nl == 0 or nr == 0:
                continue
            sl = xl * xl + (nl - xl) * (nl - xl)
            sr = xr * xr + (nr - xr) * (nr - xr)
            score = float(sl * nr + sr * nl) / float(nl * nr)
            key = (-score, f, v)
            if best is None or key < best[0]:
                best = (key, (f, v, score, nl, xl, nr, xr))
    return best[1]


def test_stump_perfect_split(spark):
    # y == 1 iff f1 <= 4; f2 is noise
    rows = [(v, (v * 7) % 5, 1 if v <= 4 else 0) for v in range(10)] * 3
    df = spark.createDataFrame(rows, "f1: long, f2: long, y: int")
    r = stump_train(df, ["f1", "f2"], "y").collect()[0]
    assert (r.feature, r.threshold) == ("f1", 4)
    assert r.pos_left == r.n_left and r.pos_right == 0


def test_stump_brute(spark):
    rows = [
        ((i * 3) % 7, (i * 5) % 4, 1 if (i * 11) % 3 == 0 else 0)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "f1: long, f2: long, y: int")
    got = stump_train(df, ["f1", "f2"], "y").collect()[0]
    want = _stump_ref(rows, ["f1", "f2"])
    assert (
        got.feature,
        got.threshold,
        got.score,
        got.n_left,
        got.pos_left,
        got.n_right,
        got.pos_right,
    ) == want


def test_prop_test_hand(spark):
    # arm0 (even users): 1 of 3 convert; arm1: 2 of 3
    rows = []
    for u, conv in [(0, 1), (2, 0), (4, 0), (1, 1), (3, 1), (5, 0)]:
        rows.append((u, "purchase" if conv else "view"))
        rows.append((u, "click"))
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    r = prop_test(df).collect()[0]
    assert (r.n0, r.x0, r.n1, r.x1) == (3, 1, 3, 2)
    p0, p1, pp = 1 / 3, 2 / 3, 3 / 6
    z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / 3 + 1 / 3))
    assert r.z == math.floor(z * 1e6 + 0.5) / 1e6


def test_prop_test_degenerate(spark):
    rows = [(u, "view") for u in range(6)]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    r = prop_test(df).collect()[0]
    assert r.z == 0.0 and r.x0 == 0 and r.x1 == 0
