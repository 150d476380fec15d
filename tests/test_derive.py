"""Golden-fixture and semantics tests for the influence-edge derivation.

The golden set is the reference's 7-edge integration-test output
(``crgp-lib/tests/algorithm_execution.rs:58-66``), asserted
order-insensitively exactly like the reference does (``:67-73``), on BOTH
derivation paths (transcripts and reference-shaped retweets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crgp_spark.derive import (
    derive_edge_turns,
    derive_edges,
    derive_edges_from_retweets,
)
from crgp_spark.golden import (
    GOLDEN_EDGE_TURNS,
    GOLDEN_EDGES,
    golden_friendships,
    golden_retweets,
    golden_transcripts,
)


def test_golden_transcripts_path(spark):
    edges = derive_edge_turns(
        golden_transcripts(spark), golden_friendships(spark)
    )
    got = {
        (r.conv_id, r.src_turn, r.dst_turn, r.ts // 1_000_000)
        for r in edges.collect()
    }
    assert got == GOLDEN_EDGE_TURNS


def test_golden_retweets_path(spark):
    out = derive_edges_from_retweets(
        golden_retweets(spark), golden_friendships(spark, as_participants=False)
    )
    got = {
        (r.cascade_id, r.retweet_id, r.influencee, r.influencer, r.ts)
        for r in out.collect()
    }
    assert got == GOLDEN_EDGES


def test_dense_rule_superset_of_golden(spark):
    """Without a friendship graph every other participant is a candidate —
    the result must be a superset of the graph-restricted edges and must
    additionally include originator edges the sparse graph blocked
    (e.g. u0 -> u3's turn in conv_1: u0 not in friends(u3))."""
    dense = derive_edge_turns(golden_transcripts(spark))
    got = {
        (r.conv_id, r.src_turn, r.dst_turn, r.ts // 1_000_000)
        for r in dense.collect()
    }
    assert GOLDEN_EDGE_TURNS <= got
    assert ("conv_1", 0, 3, 3) in got  # originator edge blocked by graph


def test_strict_inequality_no_edge_on_equal_ts(spark):
    """Equal timestamps produce NO activation edge (reconstruct.rs:83
    strict >) — only the originator OR-branch may fire."""
    import datetime as dt

    ts0 = dt.datetime(2020, 1, 1)
    rows = [
        ("c", 0, "a", "t0", None, ts0),
        ("c", 1, "b", "t1", None, ts0),  # same ts as opener
        ("c", 2, "d", "t2", None, ts0),  # same ts again
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {
        (r.src_turn, r.dst_turn) for r in derive_edge_turns(t).collect()
    }
    # Only originator edges survive: a->1 and a->2. b@ts0 does NOT
    # influence d@ts0 (not strictly earlier).
    assert got == {(0, 1), (0, 2)}


def test_vid_form_consistent(spark):
    """Vertex-id form carries the same edge multiset as natural-key form."""
    t = golden_transcripts(spark)
    f = golden_friendships(spark)
    n_turn = derive_edge_turns(t, f).count()
    n_vid = derive_edges(t, f).count()
    assert n_turn == n_vid == len(GOLDEN_EDGE_TURNS)
    # src always differs from dst (no self-loops in the golden set)
    assert (
        derive_edges(t, f).filter(F.col("src") == F.col("dst")).count() == 0
    )


def test_repeat_participant_turns(spark):
    """A participant's second turn gets influence edges from participants
    activated before it, including via their first turns only (src is
    always the influencer's FIRST turn, or_insert semantics)."""
    import datetime as dt

    base = dt.datetime(2020, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        ("c", 0, "a", "t0", None, ts(0)),
        ("c", 1, "b", "t1", None, ts(1)),
        ("c", 2, "a", "t2", None, ts(2)),
        ("c", 3, "b", "t3", None, ts(3)),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {(r.src_turn, r.dst_turn) for r in derive_edge_turns(t).collect()}
    # b's turn1: a is originator -> (0,1). a's turn2: b activated@1<2 -> (1,2).
    # b's turn3: a orig -> (0,3). No self-influence (a's turn2 gets no edge
    # from a's own turn0).
    assert got == {(0, 1), (1, 2), (0, 3)}
