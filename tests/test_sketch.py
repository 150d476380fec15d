"""KMV distinct sketch: exact below k, estimator above k reproduced
hash-for-hash in Python, and merge-like stability under duplication."""

from __future__ import annotations

import hashlib
import math

from crgp_spark.operators.sketch import kmv_distinct


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def _est(values, k):
    hs = sorted({hashlib.md5(str(v).encode()).hexdigest() for v in values})
    if len(hs) < k:
        return float(len(hs)), len(hs), None
    kth = hs[k - 1]
    num = int(kth[:15], 16)
    raw = (k - 1.0) / (float(num) / float(1 << 60))
    return math.floor(raw * 10000.0 + 0.5) / 10000.0, k, kth


def test_exact_below_k(spark):
    rows = [("a", v) for v in (1, 2, 3)] + [("a", 2)]  # 3 distinct
    got = kmv_distinct(_df(spark, rows), "g", "v", k=8).collect()[0]
    assert (got["n_kept"], got["kth_hash"], got["est_distinct"]) == (3, None, 3.0)


def test_estimate_matches_python_reference(spark):
    values = list(range(200))
    rows = [("a", v) for v in values]
    got = kmv_distinct(_df(spark, rows), "g", "v", k=16).collect()[0]
    est, n_kept, kth = _est(values, 16)
    assert got["n_kept"] == n_kept
    assert got["kth_hash"] == kth
    assert got["est_distinct"] == est
    # statistical sanity: within 50% of truth at k=16
    assert 100 <= got["est_distinct"] <= 400


def test_duplicates_do_not_change_sketch(spark):
    base = [("a", v) for v in range(100)]
    got1 = kmv_distinct(_df(spark, base), "g", "v", k=16).collect()[0]
    got2 = kmv_distinct(_df(spark, base * 3), "g", "v", k=16).collect()[0]
    assert got1.asDict() == got2.asDict()


def test_groups_independent(spark):
    rows = [("a", v) for v in range(50)] + [("b", v) for v in range(5)]
    got = {r["g"]: r for r in kmv_distinct(_df(spark, rows), "g", "v", k=16).collect()}
    assert got["b"]["est_distinct"] == 5.0 and got["b"]["kth_hash"] is None
    est_a, _, _ = _est(list(range(50)), 16)
    assert got["a"]["est_distinct"] == est_a


def test_kmv_merge_is_monoid(spark):
    """merge(sketch(X), sketch(Y)) == sketch(X u Y) — the property
    that makes KMV rollup-able across partitions/days/tenants."""
    from crgp_spark.operators.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    x = _df(spark, [("a", v) for v in range(0, 120)] + [("b", 1)])
    y = _df(spark, [("a", v) for v in range(80, 200)] + [("c", 2)])
    whole = _df(
        spark,
        [("a", v) for v in range(0, 200)] + [("b", 1), ("c", 2)],
    )
    merged = kmv_merge(kmv_sketch(x, "g", "v", 16), kmv_sketch(y, "g", "v", 16), 16)
    direct = kmv_sketch(whole, "g", "v", 16)
    got = sorted((r["g"], tuple(r["hs"])) for r in merged.collect())
    want = sorted((r["g"], tuple(r["hs"])) for r in direct.collect())
    assert got == want
    # and the estimates therefore agree too
    em = sorted(map(tuple, kmv_estimate(merged, 16).collect()))
    ed = sorted(map(tuple, kmv_estimate(direct, 16).collect()))
    assert em == ed


def _isect_ref(xs, ys, k):
    """Python mirror of kmv_intersect for one group."""
    ha = sorted({hashlib.md5(str(v).encode()).hexdigest() for v in xs})[:k]
    hb = sorted({hashlib.md5(str(v).encode()).hexdigest() for v in ys})[:k]
    kth_a = ha[k - 1] if len(ha) >= k else None
    kth_b = hb[k - 1] if len(hb) >= k else None
    thetas = [t for t in (kth_a, kth_b) if t is not None]
    theta = min(thetas) if thetas else None
    common = set(ha) & set(hb)
    if theta is None:
        n = len(common)
        return n, float(n)
    n = len([h for h in common if h < theta])
    num = int(theta[:15], 16)
    raw = n / (float(num) / float(1 << 60))
    return n, math.floor(raw * 10000.0 + 0.5) / 10000.0


def test_intersect_exact_when_small(spark):
    from crgp_spark.operators.sketch import kmv_intersect, kmv_sketch

    x = _df(spark, [("a", v) for v in (1, 2, 3, 4)] + [("b", 9)])
    y = _df(spark, [("a", v) for v in (3, 4, 5)] + [("b", 9)])
    got = {
        r["g"]: (r["n_common"], r["est_intersect"])
        for r in kmv_intersect(
            kmv_sketch(x, "g", "v", 16), kmv_sketch(y, "g", "v", 16), 16
        ).collect()
    }
    assert got["a"] == (2, 2.0)  # {3, 4}
    assert got["b"] == (1, 1.0)


def test_intersect_estimate_matches_python_reference(spark):
    from crgp_spark.operators.sketch import kmv_intersect, kmv_sketch

    xs, ys = list(range(0, 150)), list(range(100, 260))
    x = _df(spark, [("a", v) for v in xs])
    y = _df(spark, [("a", v) for v in ys])
    [r] = kmv_intersect(
        kmv_sketch(x, "g", "v", 32), kmv_sketch(y, "g", "v", 32), 32
    ).collect()
    n_ref, est_ref = _isect_ref(xs, ys, 32)
    assert (r["n_common"], r["est_intersect"]) == (n_ref, est_ref)


def test_intersect_mixed_exact_and_sketched(spark):
    from crgp_spark.operators.sketch import kmv_intersect, kmv_sketch

    xs, ys = list(range(0, 200)), list(range(150, 170))  # y exact (<k)
    x = _df(spark, [("a", v) for v in xs])
    y = _df(spark, [("a", v) for v in ys])
    [r] = kmv_intersect(
        kmv_sketch(x, "g", "v", 32), kmv_sketch(y, "g", "v", 32), 32
    ).collect()
    n_ref, est_ref = _isect_ref(xs, ys, 32)
    assert (r["n_common"], r["est_intersect"]) == (n_ref, est_ref)
