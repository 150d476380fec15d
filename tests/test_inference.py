from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from crgp_spark.operators.inference import batch_inference, model_weights


def _pdf(n=500, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "cat": rng.choice(["a", "b", "c", None], n).tolist(),
            "num": rng.integers(0, 40, n).astype(np.int64),
        }
    )


def _oracle(pdf, cols, dim=64, seed=7):
    w = model_weights(dim, seed)
    out = {}
    for _, row in pdf.iterrows():
        z = 0
        for i, c in enumerate(cols):
            v = row[c]
            s = "\x00NULL" if v is None else str(v)
            h = int(
                hashlib.md5(f"{i}:{c}={s}".encode()).hexdigest()[:15], 16
            )
            z += (-1 if (h % (2 * dim)) >= dim else 1) * w[h % dim]
        out[int(row["rid"])] = z
    return out


def test_matches_hand_model(spark):
    pdf = _pdf()
    got = {
        r.rid: (r.logit, r.score, r.label)
        for r in batch_inference(
            spark.createDataFrame(pdf), ["cat", "num"], id_col="rid"
        ).collect()
    }
    want = _oracle(pdf, ["cat", "num"])
    assert set(got) == set(want)
    for rid, z in want.items():
        gz, gs, gl = got[rid]
        assert gz == z
        assert gs == 0.5 + z / (2.0 * (1.0 + abs(z)))
        assert gl == (z >= 0)


def test_partition_invariance(spark):
    pdf = _pdf(300, seed=11)
    base = None
    for parts in (1, 7):
        df = spark.createDataFrame(pdf).repartition(parts)
        got = sorted(
            (r.rid, r.logit, r.score, r.label)
            for r in batch_inference(df, ["cat", "num"], id_col="rid").collect()
        )
        if base is None:
            base = got
        else:
            assert got == base


def test_weights_deterministic_and_bounded():
    w1 = model_weights(64, 7)
    w2 = model_weights(64, 7)
    assert w1 == w2
    assert all(-127 <= x <= 127 for x in w1)
    assert model_weights(64, 8) != w1


def test_plan_is_single_scan(spark):
    """The forward pass must be one scan-shaped pass: no Exchange in
    the physical plan (VERDICT r3 #3's done-criterion)."""
    df = spark.createDataFrame(_pdf(50))
    plan = (
        batch_inference(df, ["cat", "num"], id_col="rid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_empty_and_needs_cols(spark):
    with pytest.raises(ValueError):
        batch_inference(spark.createDataFrame(_pdf(5)), [], id_col="rid")
    empty = spark.createDataFrame([], "rid long, cat string, num long")
    assert batch_inference(empty, ["cat"], id_col="rid").count() == 0
