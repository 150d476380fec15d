"""Bipartite projection: the conversation–participant membership
relation projected onto a weighted participant–participant
co-occurrence graph — the graph-CONSTRUCTION primitive complementing
``derive.py`` (derive builds the temporal influence graph inside each
conversation; this builds the social co-participation graph across
conversations, the classic two-mode→one-mode projection every
link-graph stack ships).

Output: ``(a, b, n_convs)`` with ``a < b`` — the number of
conversations in which both participants appear.

Scale shape: one distinct on (conv, participant) — map-side
combinable — then a self-equi-join on ``conv_id`` and a partial-agg
pair count.  A conversation of p participants emits p·(p−1)/2 pairs,
so the fan-out is quadratic in CONVERSATION size, not in graph size —
the textbook projection blow-up.  ``max_conv_size`` is the standard
mitigation (drop mega-conversations before pairing: they contribute
near-clique noise and dominate cost); AQE's skew split handles
residual imbalance on the conv key.  No per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coparticipation(
    turns: DataFrame, max_conv_size: int | None = None
) -> DataFrame:
    """Project ``turns(conv_id, participant, ...)`` membership onto the
    weighted participant co-occurrence graph; see module docstring."""
    pc = turns.select("conv_id", "participant").distinct()
    if max_conv_size is not None:
        small = (
            pc.groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= max_conv_size)
            .select("conv_id")
        )
        pc = pc.join(small.hint("shuffle_hash"), "conv_id", "left_semi")
    left = pc.select("conv_id", F.col("participant").alias("a"))
    right = pc.select("conv_id", F.col("participant").alias("b"))
    return (
        left.join(right, "conv_id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_convs"))
    )
