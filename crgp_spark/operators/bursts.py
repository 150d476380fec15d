"""Kleinberg burst detection (Kleinberg, KDD 2002 — "Bursty and
Hierarchical Structure in Streams") over per-user event sequences:
the 2-state min-cost automaton that separates sustained activity
bursts from base-rate chatter, the standard temporal-burst primitive
for exactly this kind of event stream.  State 0 emits gaps at the
sequence's base rate a₀ = 1/mean_gap, state 1 at a₁ = 2·a₀; entering
the burst state costs γ.  The forward (filtering) recursion

    c0_j = min(c0_{j-1}, c1_{j-1})     + cost₀(x_j)
    c1_j = min(c0_{j-1} + γ, c1_{j-1}) + cost₁(x_j)

is evaluated exactly.  Per key we report the gap count, the number of
steps whose filtered min-cost state is the burst state (c1 < c0), and
the final min cost — the forward quantities (no backward smoothing
pass; the smoothed Viterbi labels need a backtrack that a streaming/
SQL-parallel formulation deliberately avoids).

Exactness device: for exponential gap costs, cost_i(x) = a_i·x −
ln a_i.  With a₁ = 2·a₀ the unknown ln(mean_gap) is COMMON to both
states, so only the difference ln 2 matters for every min comparison
and for cost differences — and a₀·x = x·n_gaps/span is rational.  In
micro-5 units (scale 10⁵):

    cost₀(x) = (x·n·S)   div span
    cost₁(x) = (x·n·2·S) div span − 69314        (⌊S·ln 2⌋)

— every quantity BIGINT, no runtime logarithms, bit-identical
cross-engine (the common −ln(mean_gap)·S term is dropped from BOTH
states, shifting all costs equally).  Overflow bound: x·n·2·S ≤
span·n·2·10⁵ — int64 holds any key with n ≤ ~4·10⁸ gaps at
day-scale millisecond spans (documented, loudly exceeded in DuckDB's
HUGEINT comparison, not silently).

Scale shape: gaps are one window-lag per key (shuffle on the key);
the DP is conversation/user-LOCAL, run as ONE ``applyInPandas`` pass
per key group — O(sequence) work per key inside an Arrow batch, no
cross-key state, no driver-side data.  The DuckDB twin replays the
identical recursion with a WITH RECURSIVE step join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["burst_detect"]

#: cost scale (micro-5 nats) and the only log constant the recursion
#: needs: floor(SCALE * ln 2)
SCALE = 100_000
LN2 = 69_314
GAMMA = 100_000

_OUT_SCHEMA = "uid long, n_gaps long, burst_steps long, cost long"


def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    uid = int(pdf["uid"].iloc[0])
    t = np.sort(pdf["t"].to_numpy(dtype=np.int64))
    x = np.diff(t)
    n = int(x.size)
    span = int(t[-1] - t[0]) if n else 0
    if n < 1 or span <= 0:
        return pd.DataFrame(
            {"uid": [uid], "n_gaps": [n], "burst_steps": [0], "cost": [0]}
        )
    xi = x.astype(object)  # python ints: exact, overflow-free div
    c0, c1 = 0, GAMMA
    burst = 0
    for j in range(n):
        g = int(xi[j])
        cost0 = (g * n * SCALE) // span
        cost1 = (g * n * 2 * SCALE) // span - LN2
        n0 = min(c0, c1) + cost0
        n1 = min(c0 + GAMMA, c1) + cost1
        if n1 < n0:
            burst += 1
        c0, c1 = n0, n1
    return pd.DataFrame(
        {
            "uid": [uid],
            "n_gaps": [n],
            "burst_steps": [burst],
            "cost": [min(c0, c1)],
        }
    )


def burst_detect(events_keyed: DataFrame) -> DataFrame:
    """``events_keyed`` = ``(uid, t)`` integer event times (one row per
    event).  Returns ``(uid, n_gaps, burst_steps, cost)`` per key —
    keys whose events share one timestamp (span 0) report zeros."""
    return (
        events_keyed.select(
            F.col("uid").cast("long").alias("uid"),
            F.col("t").cast("long").alias("t"),
        )
        .groupBy("uid")
        .applyInPandas(_kernel, _OUT_SCHEMA)
    )
