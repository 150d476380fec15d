"""Transition counts and mixture manifests: hand-computed fixtures."""

from __future__ import annotations

import datetime

from crgp_spark.operators.transitions import mixture_manifest, transition_counts


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (uid, eid, datetime.datetime(2026, 1, 1, 0, 0, s), t)
            for uid, eid, s, t in rows
        ],
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )


def test_transition_counts_exact(spark):
    rows = [
        (1, 1, 1, "view"), (1, 2, 2, "view"), (1, 3, 3, "click"),
        (2, 4, 1, "view"), (2, 5, 2, "click"), (2, 6, 3, "buy"),
        (3, 7, 1, "buy"),  # single event -> no transition
    ]
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in transition_counts(_events(spark, rows)).collect()
    }
    # from view: view->view 1, view->click 2 (users 1 and 2) -> tot 3
    assert got[("view", "view")] == (1, 0.3333)
    assert got[("view", "click")] == (2, 0.6667)
    assert got[("click", "buy")] == (1, 1.0)
    assert ("buy", "view") not in got


def test_transition_order_is_ts_then_event_id(spark):
    # same timestamp: event_id breaks the tie deterministically
    rows = [(1, 2, 5, "b"), (1, 1, 5, "a"), (1, 3, 6, "c")]
    got = {
        (r["from_type"], r["to_type"])
        for r in transition_counts(_events(spark, rows)).collect()
    }
    assert got == {("a", "b"), ("b", "c")}


def test_mixture_manifest_rates(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three four", "big"),     # 4 tokens
            (2, "five six seven eight", "big"),   # 4 tokens
            (3, "alpha beta", "small"),           # 2 tokens
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r.asDict() for r in mixture_manifest(docs).collect()}
    assert got["big"]["n_docs"] == 2 and got["big"]["n_tokens"] == 8
    assert got["small"]["n_tokens"] == 2
    assert got["small"]["sample_rate"] == 1.0
    assert got["big"]["sample_rate"] == 0.25
