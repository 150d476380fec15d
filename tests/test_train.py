"""logistic_train vs an exact integer python reference."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.train import logistic_train


def _md5n(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_train(rows, cols, dim, rounds, lr_num, lr_den, q, w_scale):
    """rows: list of (id, y, {col: value}) — mirrors the operator's
    integer spec exactly."""
    feats = []  # (row_idx, j, sgn)
    for ri, (_, _, vals) in enumerate(rows):
        for i, c in enumerate(cols):
            v = vals[c]
            sv = "\x00NULL" if v is None else str(v)
            n = _md5n(f"{i}:{c}={sv}")
            feats.append((ri, n % dim, -1 if n % (2 * dim) >= dim else 1))
    n_rows = len(rows)
    w = [0] * dim
    for _ in range(rounds):
        z = [0] * n_rows
        for ri, j, sgn in feats:
            z[ri] += sgn * w[j]
        err = []
        for ri, (_, y, _) in enumerate(rows):
            zz = z[ri]
            p_q = (q * (w_scale + abs(zz) + zz)) // (2 * (w_scale + abs(zz)))
            err.append(p_q - y * q)
        g = [0] * dim
        for ri, j, sgn in feats:
            g[j] += err[ri] * sgn
        for j in range(dim):
            gg = g[j]
            sgn_g = (gg > 0) - (gg < 0)
            w[j] -= sgn_g * (
                (lr_num * abs(gg) * w_scale) // (lr_den * n_rows * q)
            )
    return w


def test_matches_python_reference(spark):
    rows = [
        (i, i % 3 == 0 and 1 or 0, {"a": f"v{i % 5}", "b": i % 7})
        for i in range(200)
    ]
    df = spark.createDataFrame(
        [(i, y, v["a"], v["b"]) for i, y, v in rows],
        "id long, y int, a string, b long",
    )
    got = {
        r["j"]: r["w"]
        for r in logistic_train(
            df, ["a", "b"], "y", "id", dim=8, rounds=3,
            lr_num=1, lr_den=4, q=10_000, w_scale=1000,
        ).collect()
    }
    want = _py_train(
        [(i, y, v) for i, y, v in rows],
        ["a", "b"], 8, 3, 1, 4, 10_000, 1000,
    )
    assert got == {j: w for j, w in enumerate(want)}
    assert any(w != 0 for w in want)  # learning actually happened


def test_learns_separable_signal(spark):
    # y == 1 iff a == "pos": the weight at "pos"'s hashed index must
    # move opposite to "neg"'s (signed by their hash signs)
    df = spark.createDataFrame(
        [(i, 1 if i % 2 == 0 else 0, "pos" if i % 2 == 0 else "neg")
         for i in range(400)],
        "id long, y int, a string",
    )
    w = {
        r["j"]: r["w"]
        for r in logistic_train(
            df, ["a"], "y", "id", dim=16, rounds=5, lr_num=1, lr_den=1,
        ).collect()
    }
    n_pos = _md5n("0:a=pos")
    n_neg = _md5n("0:a=neg")
    s_pos = -1 if n_pos % 32 >= 16 else 1
    s_neg = -1 if n_neg % 32 >= 16 else 1
    # signed response to the "pos" feature must exceed "neg"'s
    assert s_pos * w[n_pos % 16] > s_neg * w[n_neg % 16]


def test_validates_params(spark):
    df = spark.createDataFrame([(1, 0, "x")], "id long, y int, a string")
    with pytest.raises(ValueError):
        logistic_train(df, ["a"], "y", "id", rounds=0)
    with pytest.raises(ValueError):
        logistic_train(df, ["a"], "y", "id", lr_den=0)
