"""stage_latency: brute-force parity (type-1 order statistics),
first-touch semantics, unconverted users excluded."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from crgp_spark.operators.cohort import stage_latency


def _mk(spark, rows):
    return spark.createDataFrame(
        [(u, s, i) for i, (u, s) in enumerate(rows)],
        "user_id long, event_type string, event_id long",
    ).select(
        "user_id",
        "event_type",
        F.timestamp_micros(F.col("event_id") * 1000).alias("ts"),
    )


def test_matches_bruteforce(spark):
    rng = random.Random(17)
    rows = []
    for _ in range(300):
        rows.append((rng.randrange(25), rng.choice(["signup", "purchase", "view"])))
    df = _mk(spark, rows)
    # brute force
    t0, t1 = {}, {}
    for i, (u, s) in enumerate(rows):
        us = i * 1000
        if s == "signup":
            t0.setdefault(u, us)
        if s == "purchase":
            t1.setdefault(u, us)
    deltas = sorted(
        t1[u] - t0[u] for u in t0 if u in t1 and t1[u] >= t0[u]
    )
    n = len(deltas)
    want = (
        len(t0),
        n,
        deltas[0],
        deltas[math.ceil(0.5 * n) - 1],
        deltas[math.ceil(0.9 * n) - 1],
        deltas[-1],
    )
    got = tuple(stage_latency(df, "signup", "purchase").collect()[0])
    assert got == want
    assert n >= 10


def test_first_touch_and_exclusions(spark):
    rows = [
        (1, "signup"),   # t=0
        (1, "purchase"),  # t=1000 -> delta 1000
        (1, "purchase"),  # later purchase ignored (first touch)
        (2, "purchase"),  # purchase BEFORE signup -> not converted
        (2, "signup"),
        (3, "signup"),    # never purchases
    ]
    df = _mk(spark, rows)
    row = stage_latency(df, "signup", "purchase").collect()[0]
    assert row["n_from"] == 3 and row["n_converted"] == 1
    assert row["min_us"] == row["max_us"] == 1000
    assert row["p50_us"] == row["p90_us"] == 1000
