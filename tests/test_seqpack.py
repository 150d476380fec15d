"""Sequence packing: hand-computed bins/offsets, shard independence."""

from __future__ import annotations

from crgp_spark.operators.seqpack import sequence_pack


def test_bins_and_offsets(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c", "s0"),        # 3 tokens, start 0
            (1, "d e f g", "s0"),      # start 3
            (2, "", "s0"),             # empty: start 7, width 0
            (3, "h i j k l", "s0"),    # start 7 -> straddles into bin 1
            (4, "x y", "s1"),          # other shard restarts at 0
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bin"], r["offset"])
        for r in sequence_pack(docs, budget=8).collect()
    }
    assert got[0] == (3, 0, 0)
    assert got[1] == (4, 0, 3)
    assert got[2] == (0, 0, 7)
    assert got[3] == (5, 0, 7)   # starts in bin 0 at offset 7
    assert got[4] == (2, 0, 0)   # shard s1 independent


def test_bin_rollover(spark):
    docs = spark.createDataFrame(
        [(i, "t " * 10, "s") for i in range(5)],
        "doc_id long, text string, source string",
    )
    got = {
        r["doc_id"]: (r["bin"], r["offset"])
        for r in sequence_pack(docs, budget=16).collect()
    }
    # starts at 0,10,20,30,40 with budget 16
    assert got == {0: (0, 0), 1: (0, 10), 2: (1, 4), 3: (1, 14), 4: (2, 8)}
