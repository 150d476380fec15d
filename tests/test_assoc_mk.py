"""association_rules (assoc.py) and mann_kendall (regress.py) vs
Python mirrors."""

from __future__ import annotations

import math
from itertools import combinations

from crgp_spark.operators.assoc import association_rules
from crgp_spark.operators.regress import mann_kendall


def test_assoc_hand_case(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "a"),   # dup collapses
        (2, "a"), (2, "b"), (2, "c"),
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    got = {(r.a, r.b): r for r in association_rules(df).collect()}
    # baskets: {a,b}, {a,b,c}, {a}, {b,c}; n=4
    assert got[("a", "b")].n_ab == 2
    assert got[("a", "c")].n_ab == 1
    assert got[("b", "c")].n_ab == 2
    r = got[("a", "b")]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.support == math.floor(2 / 4 * 1e6 + 0.5) / 1e6
    assert r.conf_ab == math.floor(2 / 3 * 1e6 + 0.5) / 1e6
    assert r.lift == math.floor(4 * 2 / 9 * 1e6 + 0.5) / 1e6


def test_assoc_brute(spark):
    rows = [
        (u, "etype_" + str((u * k) % 5))
        for u in range(30)
        for k in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    got = {(r.a, r.b): r.n_ab for r in association_rules(df).collect()}
    baskets = {}
    for u, e in rows:
        baskets.setdefault(u, set()).add(e)
    ref = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            ref[(a, b)] = ref.get((a, b), 0) + 1
    assert got == ref


def _mk_ref(xs):
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = {}
    for x in xs:
        ties[x] = ties.get(x, 0) + 1
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        g * (g - 1) * (2 * g + 5) for g in ties.values()
    )
    if var18 > 0 and s != 0:
        z = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    return n, s, var18, math.floor(z * 1e6 + 0.5) / 1e6


def _series(spark, xs):
    return spark.createDataFrame(
        [(i, int(x)) for i, x in enumerate(xs)], "t: long, x: long"
    )


def test_mk_increasing(spark):
    xs = list(range(12))
    r = mann_kendall(_series(spark, xs)).collect()[0]
    n, s, var18, z = _mk_ref(xs)
    assert (r.n, r.s, r.var18, r.z) == (n, s, var18, z)
    assert r.s == 66  # C(12,2), all concordant


def test_mk_with_ties_brute(spark):
    xs = [((i * 11) % 6) + (2 if i > 14 else 0) for i in range(25)]
    r = mann_kendall(_series(spark, xs)).collect()[0]
    assert (r.n, r.s, r.var18, r.z) == _mk_ref(xs)


def test_mk_flat_zero(spark):
    xs = [4] * 9
    r = mann_kendall(_series(spark, xs)).collect()[0]
    assert r.s == 0 and r.z == 0.0 and r.var18 == 0


def test_stream_chi2_equals_batch(spark, tmp_path):
    from crgp_spark.operators.experiment import chi2_independence
    from crgp_spark.streaming.windows import stream_chi2_test

    rows = [
        (u, ["x", "y", "z"][(u * 7 + k) % 3])
        for u in range(50)
        for k in range(2)
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string")
    work = str(tmp_path / "ev")
    df.repartition(5, "user_id").write.parquet(work)
    got = stream_chi2_test(spark, work, max_files_per_trigger=1).collect()
    want = chi2_independence(spark.read.parquet(work)).collect()
    assert sorted(r.asDict().items() for r in got) == sorted(
        r.asDict().items() for r in want
    )
