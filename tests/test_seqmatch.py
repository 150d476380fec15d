"""keyed_sequences / sequence_pattern_counts: exact ordering, code
mapping, truncation, and non-overlapping regex count semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.seqmatch import (
    keyed_sequences,
    sequence_pattern_counts,
)

CODES = {"click": "c", "error": "e", "purchase": "p"}


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, t long, event_id long"
    )
    return df.withColumn("ts", F.timestamp_micros(F.col("t"))).drop("t")


def _seqs(spark, rows, **kw):
    got = keyed_sequences(_events(spark, rows), CODES, **kw).collect()
    return {r["key"]: r["seq"] for r in got}


def test_sequence_exact_order_and_mapping(spark):
    rows = [
        (1, "error", 30, 3),
        (1, "click", 10, 1),
        (1, "error", 20, 2),
        (2, "purchase", 5, 4),
    ]
    assert _seqs(spark, rows) == {1: "cee", 2: "p"}


def test_tie_broken_by_event_id(spark):
    rows = [(1, "error", 10, 2), (1, "click", 10, 1)]
    assert _seqs(spark, rows) == {1: "ce"}


def test_unmapped_types_dropped(spark):
    rows = [(1, "click", 10, 1), (1, "view", 20, 2), (1, "error", 30, 3)]
    assert _seqs(spark, rows) == {1: "ce"}


def test_truncation_keeps_earliest_n(spark):
    rows = [(1, "click", t, t) for t in (10, 20, 30)] + [
        (1, "error", 40, 40)
    ]
    assert _seqs(spark, rows, max_events_per_key=2) == {1: "cc"}


def test_nonoverlapping_greedy_count(spark):
    rows = [
        # seq "eecec": 'e+c' matches 'eec' then 'ec' -> 2 hits
        (1, "error", 10, 1),
        (1, "error", 20, 2),
        (1, "click", 30, 3),
        (1, "error", 40, 4),
        (1, "click", 50, 5),
        # seq "ppp": 0 hits
        (2, "purchase", 10, 6),
        (2, "purchase", 20, 7),
        (2, "purchase", 30, 8),
    ]
    seqs = keyed_sequences(_events(spark, rows), CODES)
    got = {
        r["key"]: (r["seq_len"], r["n_hits"])
        for r in sequence_pattern_counts(seqs, "e+c").collect()
    }
    assert got == {1: (5, 2), 2: (3, 0)}


def test_rejects_bad_inputs(spark):
    ev = _events(spark, [(1, "click", 10, 1)])
    with pytest.raises(ValueError):
        keyed_sequences(ev, {"click": "cc"})
    with pytest.raises(ValueError):
        sequence_pattern_counts(keyed_sequences(ev, CODES), "")
