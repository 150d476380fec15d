"""Coarsening, RAG chunking and collocation lift: exact fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.operators.matching import contract_matching, maximal_matching
from crgp_spark.operators.seqpack import chunk_documents
from crgp_spark.operators.textstats import collocations


def _cfg():
    return EngineConfig(shuffle_partitions=4, graph_partitions=4)


def test_contract_matching_collapses_pairs(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "src long, dst long"
    )
    matched = spark.createDataFrame([(1, 2), (3, 4)], "u long, v long")
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in contract_matching(spark, edges, matched).collect()
    }
    # 1-2 becomes a self-loop (dropped); 2-3 -> 1-3; 3-4 self-loop;
    # 1-3 stays: two parallel 1->3 edges collapse to weight 2
    assert got == {(1, 3): 2}


def test_coarsen_endpoints_cover_input(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    m = maximal_matching(spark, edges, rounds=8, cfg=_cfg())
    coarse = contract_matching(spark, edges, m).collect()
    reps = {r["u"] for r in m.collect()}
    gone = {r["v"] for r in m.collect()}
    for r in coarse:
        assert r["src"] not in gone and r["dst"] not in gone
    assert reps  # the chain has at least one matched pair


def test_chunk_documents_windows(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "x"), (2, "")],
        "doc_id long, text string",
    )
    got = {}
    for r in chunk_documents(docs, chunk_tokens=4, overlap=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_tok"], r["n_toks"], r["chunk_text"])
        )
    # doc 0: stride 2, 7 tokens -> starts 0, 2, then capped at 7-4=3
    # (the standard last-window cap: no subset-duplicate tail chunks)
    assert sorted(got[0]) == [
        (0, 0, 4, "a b c d"),
        (1, 2, 4, "c d e f"),
        (2, 3, 4, "d e f g"),
    ]
    assert got[1] == [(0, 0, 1, "x")]
    assert 2 not in got  # empty doc -> no chunks


def test_chunk_overlap_validation(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    try:
        chunk_documents(docs, chunk_tokens=4, overlap=4)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_collocations_lift_exact(spark):
    # corpus: "x y" appears 3x together; x,y each appear once alone;
    # filler pushes totals up. tokens: per doc below.
    docs = spark.createDataFrame(
        [
            (0, "x y x y x y"),   # 6 uni; bigrams: xy,yx,xy,yx,xy
            (1, "x a b y"),       # x,y separated
        ],
        "doc_id long, text string",
    )
    got = collocations(docs, min_count=3, k_top=5).collect()
    # only "x y" (n=3) survives min_count=3; yx has n=2
    assert len(got) == 1
    r = got[0]
    assert (r["w1"], r["w2"], r["n"]) == ("x", "y", 3)
    # N_uni=10, N_bi=5+3=8; p(xy)=3/8; p(x)=p(y)=4/10
    # exact lift = 2.34375, but 4/10 is IEEE-inexact: the computed
    # double is 2.3437499999999996, so 4dp floor-rounding gives 2.3437
    # — in BOTH engines (the op order is pinned), which is the point
    assert r["lift"] == 2.3437
