"""ks_test (experiment.py) and pettitt_test (cusum.py) against
brute-force Python mirrors on hand-built fixtures."""

from __future__ import annotations

import math

import pytest

from crgp_spark.operators.cusum import pettitt_test
from crgp_spark.operators.experiment import ks_test


def _events(spark, rows):
    # (user_id, value); ts unused by ks_test
    return spark.createDataFrame(
        [(u, float(v)) for u, v in rows],
        "user_id: long, value: double",
    )


def test_ks_hand_case(spark):
    # arm0 per-user sums {100,200,300}; arm1 {250,350} -> D = 4/6
    rows = [(0, 1.0), (2, 2.0), (4, 3.0), (1, 2.5), (3, 3.5)]
    out = ks_test(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n0, r.n1, r.d_num) == (3, 2, 4)
    assert r.d_stat == math.floor(4 / 6 * 1e6 + 0.5) / 1e6


def test_ks_identical_distributions(spark):
    rows = [(u, 1.0 + ((u // 2) % 4)) for u in range(40)]
    # arms see identical value multisets by construction
    r = ks_test(_events(spark, rows)).collect()[0]
    assert r.d_num == 0 and r.d_stat == 0.0


def test_ks_brute_force(spark):
    rows = [(u, ((u * 37) % 11) / 3.0) for u in range(57)]
    per = {}
    for u, v in rows:
        per[u] = per.get(u, 0) + math.floor(v * 100 + 0.5)
    a0 = sorted(y for u, y in per.items() if u % 2 == 0)
    a1 = sorted(y for u, y in per.items() if u % 2 == 1)
    n0, n1 = len(a0), len(a1)
    vals = sorted(set(a0) | set(a1))
    d_num = max(
        abs(
            sum(1 for y in a0 if y <= v) * n1
            - sum(1 for y in a1 if y <= v) * n0
        )
        for v in vals
    )
    r = ks_test(_events(spark, rows)).collect()[0]
    assert (r.n0, r.n1, r.d_num) == (n0, n1, d_num)


def _pettitt_ref(xs):
    n = len(xs)
    best_k, best_t = -1, None
    u = 0
    for t in range(1, n + 1):  # U_t over prefix t (1-based)
        u += sum(
            (xs[t - 1] > xs[s]) - (xs[t - 1] < xs[s]) for s in range(n)
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), t
    return n, best_k, best_t


def _series(spark, xs):
    return spark.createDataFrame(
        [(i + 1, int(x)) for i, x in enumerate(xs)], "t: long, x: long"
    )


def test_pettitt_level_shift(spark):
    xs = [1, 2, 1, 2, 10, 11, 10, 11]
    n, k, cp = _pettitt_ref(xs)
    r = pettitt_test(_series(spark, xs)).collect()[0]
    assert (r.n, r.k_stat, r.cp) == (n, k, cp)
    assert r.cp == 4  # break right before the jump


def test_pettitt_with_ties_brute_force(spark):
    xs = [((i * 13) % 7) + (3 if i >= 17 else 0) for i in range(29)]
    n, k, cp = _pettitt_ref(xs)
    r = pettitt_test(_series(spark, xs)).collect()[0]
    assert (r.n, r.k_stat, r.cp) == (n, k, cp)


def test_ks_rejects_bad_arms(spark):
    with pytest.raises(ValueError):
        ks_test(_events(spark, [(0, 1.0)]), n_arms=3)


def test_stream_ks_equals_batch(spark, tmp_path):
    from crgp_spark.streaming.windows import stream_ks_test

    rows = [(u, ((u * 31) % 13) / 4.0) for u in range(80) for _ in range(2)]
    df = _events(spark, rows)
    work = str(tmp_path / "ev")
    df.repartition(6, "user_id").write.parquet(work)
    got = stream_ks_test(spark, work, max_files_per_trigger=1).collect()
    want = ks_test(spark.read.parquet(work)).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
