"""δ-temporal motif counting: handcrafted exact counts, δ cutoffs,
strict time-order / tie exclusion, interaction derivation."""

from __future__ import annotations

import pytest

from crgp_spark.operators.motifs import (
    temporal_interactions,
    temporal_motif_counts,
)


def _inter(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, us long")


def _counts(spark, rows, delta):
    r = temporal_motif_counts(_inter(spark, rows), delta).collect()
    assert len(r) == 1
    return r[0]


def test_pingpong_and_triangle_exact(spark):
    # a→b@10, b→a@20 (ping-pong); a→b@10, b→c@20, c→a@30 (triangle,
    # whose prefix is also an open 2-path)
    rows = [(1, 2, 10), (2, 1, 20), (2, 3, 20), (3, 1, 30)]
    got = _counts(spark, rows, delta=100)
    assert got["n_events"] == 4
    assert got["n_pingpong"] == 1  # (1→2, 2→1)
    # 2-paths: (1→2, 2→3) and (2→3, 3→1); (3→1, ...) has no successor
    assert got["n_2path"] == 2
    assert got["n_triangle"] == 1  # 1→2→3→1
    assert got["delta_us"] == 100


def test_delta_window_cuts_span_not_just_gaps(spark):
    # each consecutive gap is 60 but total span 120 > δ=100: the pair
    # (x,y) at gap 60 counts, the triangle spanning 120 does not
    rows = [(1, 2, 0), (2, 3, 60), (3, 1, 120)]
    assert _counts(spark, rows, 100)["n_triangle"] == 0
    assert _counts(spark, rows, 100)["n_2path"] == 2
    assert _counts(spark, rows, 120)["n_triangle"] == 1


def test_equal_timestamps_excluded_by_strict_order(spark):
    rows = [(1, 2, 10), (2, 1, 10)]
    got = _counts(spark, rows, 100)
    assert got["n_pingpong"] == 0 and got["n_2path"] == 0


def test_order_matters_not_set_membership(spark):
    # b replies BEFORE a speaks: no time-respecting motif
    rows = [(2, 1, 10), (1, 2, 20)]
    # (2→1@10, 1→2@20) IS a ping-pong (src/dst swapped role); verify
    # the count is symmetric in labels but strict in time
    assert _counts(spark, rows, 100)["n_pingpong"] == 1
    rows_rev = [(1, 2, 20), (2, 1, 10)]  # same rows, any input order
    assert _counts(spark, rows_rev, 100)["n_pingpong"] == 1


def test_rejects_nonpositive_delta(spark):
    with pytest.raises(ValueError):
        temporal_motif_counts(_inter(spark, [(1, 2, 10)]), 0)


def test_temporal_interactions_per_channel_lead(spark):
    ev = spark.createDataFrame(
        [
            (1, "c1", 10, 100),
            (2, "c1", 20, 101),
            (2, "c1", 30, 102),  # self-succession 2→2 dropped
            (3, "c1", 40, 103),
            (9, "c2", 15, 104),  # lone event on c2: no successor
        ],
        "user_id long, event_type string, t long, event_id long",
    )
    from pyspark.sql import functions as F

    ev = ev.withColumn(
        "ts", F.timestamp_micros(F.col("t"))
    ).drop("t")
    got = sorted(
        (r["src"], r["dst"], r["us"])
        for r in temporal_interactions(ev).collect()
    )
    assert got == [(1, 2, 20), (2, 3, 40)]
