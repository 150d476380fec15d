"""weighted_sample: priority-sampling parity with a pure-Python brute
force, DLT estimator threshold, weight validation."""

from __future__ import annotations

import hashlib
import random

import pytest

from crgp_spark.operators.sample import weighted_sample


def _pri(key, w, seed="s0"):
    h = int(
        hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8], 16
    )
    return (w << 32) / (h + 1)


def _brute(rows, n):
    out = []
    strata = {s for s, _, _ in rows}
    for s in strata:
        grp = sorted(
            ((k, w, _pri(k, w)) for s2, k, w in rows if s2 == s),
            key=lambda t: (-t[2], t[0]),
        )
        tau = grp[n][2] if len(grp) > n else 0.0
        for rk, (k, w, p) in enumerate(grp[:n], 1):
            out.append((s, k, w, rk, p, max(float(w), tau)))
    return sorted(out)


def _rows(n=60, seed=3):
    rng = random.Random(seed)
    return [
        (f"s{rng.randrange(3)}", i, rng.randrange(1, 500))
        for i in range(n)
    ]


def test_matches_bruteforce(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "lang string, doc_id long, w long")
    got = sorted(
        map(tuple, weighted_sample(df, "lang", "doc_id", "w", 7).collect())
    )
    assert got == _brute(rows, 7)


def test_heavy_rows_always_kept(spark):
    """A weight 10^6 times everything else has priority above any
    rival's possible maximum — it must be in the sample (the property
    that makes priority sampling weight-proportional)."""
    rows = [("a", i, 1) for i in range(30)] + [("a", 99, 1_000_000)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, w long")
    kept = {
        r["doc_id"]
        for r in weighted_sample(df, "lang", "doc_id", "w", 5).collect()
    }
    assert 99 in kept and len(kept) == 5


def test_estimator_sums_to_total_in_expectation(spark):
    """SUM(est) over the sample must land within 3x of the true total
    weight for a healthy feed (sanity, not a statistical proof)."""
    rows = _rows(n=200, seed=7)
    df = spark.createDataFrame(rows, "lang string, doc_id long, w long")
    got = weighted_sample(df, "lang", "doc_id", "w", 20).collect()
    est = sum(r["est"] for r in got)
    true = sum(w for _, _, w in rows)
    assert true / 3 <= est <= true * 3


@pytest.mark.parametrize("w", [0, -5, (1 << 20) + 1, None])
def test_bad_weights_raise(spark, w):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, w)], "lang string, doc_id long, w long"
    )
    with pytest.raises(ValueError, match="integer in"):
        weighted_sample(df, "lang", "doc_id", "w", 2)
