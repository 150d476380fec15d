"""psi (infotheory.py) and did_estimate (experiment.py) vs mirrors."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from crgp_spark.operators.experiment import did_estimate
from crgp_spark.operators.infotheory import psi

_T0 = dt.datetime(2024, 1, 1)  # epoch day 19723


def _lnq(x):
    return math.floor(math.log(x) * 1e6 + 0.5)


def _psi_ref(base, cur):
    ca, cb = Counter(base), Counter(cur)
    keys = sorted(set(ca) | set(cb))
    a = {k: ca.get(k, 0) + 1 for k in keys}
    b = {k: cb.get(k, 0) + 1 for k in keys}
    na, nb = sum(a.values()), sum(b.values())
    sa = sum(a[k] * (_lnq(a[k] * nb) - _lnq(b[k] * na)) for k in keys)
    sb = sum(b[k] * (_lnq(a[k] * nb) - _lnq(b[k] * na)) for k in keys)
    val = sa / (1e6 * na) - sb / (1e6 * nb)
    return na, nb, sa, sb, math.floor(val * 1e6 + 0.5) / 1e6


def _bk(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "bucket: long")


def test_psi_identical_is_zero(spark):
    vals = [i % 5 for i in range(50)]
    r = psi(_bk(spark, vals), _bk(spark, vals)).collect()[0]
    assert r.psi == 0.0


def test_psi_shifted_mirror(spark):
    base = [i % 5 for i in range(60)]
    cur = [(i % 7) % 5 for i in range(45)] + [9] * 4  # new bucket 9
    r = psi(_bk(spark, base), _bk(spark, cur)).collect()[0]
    assert tuple(r) == _psi_ref(base, cur)
    assert r.psi > 0


def test_did_hand_case(spark):
    # treated arm (odd users) gains +2.00 post; control flat
    rows = []
    for u in range(6):
        pre = 1.0 + (u % 2) * 0.5
        post = pre + (2.0 if u % 2 == 1 else 0.0)
        rows.append((u, _T0 + dt.timedelta(days=0), pre))
        rows.append((u, _T0 + dt.timedelta(days=5), post))
    df = spark.createDataFrame(
        rows, "user_id: long, ts: timestamp_ntz, value: double"
    )
    r = did_estimate(df, split_day=19725).collect()[0]
    assert (r.n0, r.n1) == (3, 3)
    assert r.pre0 == 1.0 and r.post0 == 1.0
    assert r.pre1 == 1.5 and r.post1 == 3.5
    assert r.did == 2.0
