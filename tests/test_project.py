"""Bipartite co-participation projection: exact counts, cap semantics."""

from __future__ import annotations

from crgp_spark.operators.project import coparticipation


def _turns(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, participant string")


def test_coparticipation_counts(spark):
    t = _turns(
        spark,
        [
            ("c1", "x"), ("c1", "y"), ("c1", "x"),  # duplicate membership
            ("c2", "x"), ("c2", "y"), ("c2", "z"),
            ("c3", "z"),  # singleton conversation: no pairs
        ],
    )
    got = {(r["a"], r["b"]): r["n_convs"] for r in coparticipation(t).collect()}
    assert got == {("x", "y"): 2, ("x", "z"): 1, ("y", "z"): 1}


def test_coparticipation_max_conv_size(spark):
    t = _turns(
        spark,
        [("big", p) for p in ("a", "b", "c", "d")] + [("s", "a"), ("s", "b")],
    )
    got = {(r["a"], r["b"]): r["n_convs"]
           for r in coparticipation(t, max_conv_size=3).collect()}
    assert got == {("a", "b"): 1}  # the 4-participant conversation is cut
