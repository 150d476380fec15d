from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crgp_spark.operators import dedup, textstats


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over a lazy dog today"),  # near dup
        (3, "completely different content about spark engines and data"),
        (4, "el gato de la casa que corre por los tejados de madrid"),
        (5, ""),
        (6, "le chat est dans la maison et les oiseaux dans le jardin"),
        (7, "short text"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(base, columns=["doc_id", "text"])
    ).persist()


def test_exact_dedup(spark, docs):
    out = {r.keep_id: r.n_dupes for r in dedup.exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0,1 collapse, min id kept
    assert 1 not in out
    assert sum(out.values()) == 8


def test_shingles_and_jaccard(spark, docs):
    pairs = dedup.jaccard_pairs(docs, threshold=0.5).collect()
    got = {(r.a, r.b) for r in pairs}
    assert (0, 1) in got  # identical
    for r in pairs:
        assert r.inter <= r.uni


def test_minhash_lsh_finds_exact_dups(spark, docs):
    cands = {(r.a, r.b) for r in dedup.lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in cands  # identical docs always share every band
    survivors = {r.doc_id for r in dedup.minhash_dedup(docs).collect()}
    assert 0 in survivors and 1 not in survivors
    assert 3 in survivors and 4 in survivors


def test_simhash_properties(spark, docs):
    out = {r.doc_id: r.simhash for r in dedup.simhash(docs, n_bits=32).collect()}
    assert out[0] == out[1]  # identical text -> identical simhash
    assert all(len(v) == 32 and set(v) <= {"0", "1"} for v in out.values())
    # near-dup closer than unrelated
    ham = lambda x, y: sum(a != b for a, b in zip(x, y))
    assert ham(out[0], out[2]) < ham(out[0], out[3])


def test_simhash_dedup_pipeline(spark, docs):
    """Hamming-LSH dedup: identical docs always collapse (hamming 0,
    every band equal); pairs carry the exact hamming distance; the
    smaller doc_id of each verified pair survives."""
    pairs = {
        (r.a, r.b): r.hamming
        for r in dedup.simhash_pairs(
            docs, n_bits=32, n_bands=4, max_hamming=3
        ).collect()
    }
    assert pairs[(0, 1)] == 0
    assert all(h <= 3 for h in pairs.values())
    survivors = {
        r.doc_id
        for r in dedup.simhash_dedup(
            docs, n_bits=32, n_bands=4, max_hamming=3
        ).collect()
    }
    assert 0 in survivors and 1 not in survivors
    # every dropped doc is the larger side of some verified pair
    dropped = {r.doc_id for r in docs.select("doc_id").collect()} - survivors
    assert dropped == {b for (_a, b) in pairs}


def test_token_stats(spark, docs):
    out = {r.doc_id: r for r in textstats.token_stats(docs).collect()}
    assert out[0].n_tokens == 9
    assert out[5].n_tokens == 0
    assert out[7].n_tokens == 2
    assert out[0].n_distinct_tokens == 8  # 'the' twice


def test_quality_and_langid(spark, docs):
    q = {r.doc_id: r.quality for r in textstats.quality_score(docs).collect()}
    assert all(0.0 <= v <= 1.0 for v in q.values())
    assert q[3] > q[5]  # real text beats empty
    langs = {r.doc_id: r.pred_lang for r in textstats.lang_id(docs).collect()}
    assert langs[0] == "en"
    assert langs[4] == "es"
    assert langs[6] == "fr"
    assert langs[5] == "und"


def test_fingerprint_normalisation(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(0, "Hello,   World!"), (1, "hello world"), (2, "other")],
            columns=["doc_id", "text"],
        )
    )
    fp = {r.doc_id: r.fp for r in textstats.fingerprint(df).collect()}
    assert fp[0] == fp[1] != fp[2]


def test_bpe_token_count(spark, docs):
    out = {r.doc_id: r.n_bpe_tokens for r in textstats.bpe_token_count(docs).collect()}
    # "the quick brown fox jumps over the lazy dog" -> 9 letter runs
    assert out[0] == 9
    assert out[5] == 0  # empty text
    # contractions/punct split: check a constructed doc
    d2 = spark.createDataFrame([(99, "don't stop, it's 42!")], "doc_id long, text string")
    n = textstats.bpe_token_count(d2).collect()[0].n_bpe_tokens
    # don | 't | stop | , | it | 's | 42 | !
    assert n == 8


def test_winnowing_fingerprints(spark, docs):
    fps = textstats.winnowing_fingerprints(docs, k=3, w=2).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # identical docs -> identical fingerprint sets
    assert by_doc[0] == by_doc[1]
    # near-dup shares at least one fingerprint (common run >= k+w-1 words)
    assert by_doc[0] & by_doc[2]
    # unrelated docs share nothing
    assert not (by_doc[0] & by_doc[3])
    # empty text -> no fingerprints
    assert 5 not in by_doc


def test_tfidf_topk_ranks_rare_terms(spark):
    from crgp_spark.operators.textstats import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common common common"),
            (2, "banana cherry common common"),
            (3, "common words only here common"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["rk"]): (r["term"], r["tf"], r["df"])
        for r in tfidf_topk(docs, k_top=2).collect()
    }
    # doc 1: 'apple' is tf=2 df=1 — beats 'common' (tf=3 df=3)
    assert out[(1, 1)] == ("apple", 2, 1)
    # doc 2: 'common' (tf=2, score 2.0) edges 'cherry' (1·(ln2+1)=1.69),
    # which in turn beats 'banana' (df=2, lower idf)
    assert out[(2, 1)] == ("common", 2, 3)
    assert out[(2, 2)] == ("cherry", 1, 1)


def test_setsim_join_exact_vs_bruteforce(spark):
    from itertools import combinations

    from crgp_spark.operators.dedup import setsim_join

    rows = [
        (0, "a b c d e"),
        (1, "a b c d f"),      # J(0,1) = 4/6 = 0.667
        (2, "a b c d e"),      # J(0,2) = 1.0
        (3, "x y z"),          # J with others = low
        (4, "a b c d e x"),    # J(0,4) = 5/6 = 0.833
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc1"], r["doc2"]): (r["inter"], r["uni"], r["jaccard"])
        for r in setsim_join(docs, threshold=(2, 3)).collect()
    }
    # brute force at t = 2/3
    sets = {i: set(t.split()) for i, t in rows if t}
    exp = {}
    for a, b in combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if i * 3 >= 2 * u:
            exp[(a, b)] = (i, u)
    assert {k: v[:2] for k, v in got.items()} == exp
    assert got[(0, 2)][2] == 1.0
    assert got[(0, 4)][2] == 0.8333


def test_setsim_threshold_validation(spark):
    from crgp_spark.operators.dedup import setsim_join

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    try:
        setsim_join(docs, threshold=(3, 2))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_setsim_shingle_path(spark):
    from crgp_spark.operators.dedup import setsim_join

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "completely different words in this document here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc1"], r["doc2"])
        for r in setsim_join(docs, threshold=(1, 2), shingle_k=3).collect()
    }
    # docs 0/1 share 6 of their 7 3-shingles -> J = 6/8 = 0.75 >= 0.5
    assert got == {(0, 1)}


class TestDuplicateSpans:
    def test_shared_passage_flagged_with_exact_bounds(self, spark):
        # docs 10/11 share an 8-token passage at different offsets;
        # surrounding text is unique -> exactly the passage's 5-gram
        # cover [offset, offset+8) is reported in each doc
        shared = "alpha bravo charlie delta echo foxtrot golf hotel"
        d = spark.createDataFrame(
            [
                (10, f"unique one two three {shared} tail marker words"),
                (11, f"{shared} completely other ending here now"),
                (12, "nothing in common with anything else at all"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: (r["span_start"], r["span_end"], r["n_grams"])
            for r in dedup.duplicate_spans(d, gram_len=5).collect()
        }
        # doc 10: shared starts at token 4 -> span [4, 12), 4 grams
        # doc 11: shared starts at token 0 -> span [0, 8), 4 grams
        assert out == {10: (4, 12, 4), 11: (0, 8, 4)}

    def test_within_doc_repeat_counts(self, spark):
        # a 5-gram repeated inside ONE doc is corpus-multiplicity 2
        d = spark.createDataFrame(
            [(1, "a b c d e x y z w v a b c d e")],
            "doc_id long, text string",
        )
        rows = sorted(
            map(tuple, dedup.duplicate_spans(d, gram_len=5).collect())
        )
        assert rows == [(1, 0, 5, 1), (1, 10, 15, 1)]

    def test_overlapping_grams_merge_to_one_span(self, spark):
        # two identical docs: every gram is duplicated -> ONE maximal
        # span covering the whole doc in each
        t = "one two three four five six seven eight nine"
        d = spark.createDataFrame(
            [(1, t), (2, t)], "doc_id long, text string"
        )
        rows = sorted(
            map(tuple, dedup.duplicate_spans(d, gram_len=5).collect())
        )
        assert rows == [(1, 0, 9, 5), (2, 0, 9, 5)]

    def test_short_and_clean_docs_yield_nothing(self, spark):
        d = spark.createDataFrame(
            [(1, "too short"), (2, "also tiny"), (3, "")],
            "doc_id long, text string",
        )
        assert dedup.duplicate_spans(d, gram_len=5).count() == 0

    def test_validates_params(self, spark):
        d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            dedup.duplicate_spans(d, gram_len=0)
        with pytest.raises(ValueError):
            dedup.duplicate_spans(d, min_count=1)
