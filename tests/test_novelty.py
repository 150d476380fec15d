"""novelty_scores: first-occurrence attribution, verbatim repeats
score 0, empty docs kept, brute-force parity."""

from __future__ import annotations

import re

from crgp_spark.operators.curation import novelty_scores


def _shingles(text, k=3):
    toks = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split()
    if not toks:
        return set()
    if len(toks) <= k:
        return {" ".join(toks[:k])}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _brute(docs):
    first = {}
    for doc_id, text in sorted(docs):
        for g in _shingles(text):
            first.setdefault(g, doc_id)
    out = {}
    for doc_id, text in docs:
        sh = _shingles(text)
        novel = sum(1 for g in sh if first[g] == doc_id)
        out[doc_id] = (
            len(sh),
            novel,
            novel / len(sh) if sh else 0.0,
        )
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # verbatim
    (3, "a completely different sentence with fresh words here"),
    (4, "the quick brown fox went somewhere entirely new today"),
    (5, ""),
]


def test_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in novelty_scores(df).collect()
    }
    assert got == _brute(DOCS)


def test_repeat_scores_zero_first_scores_one(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["novelty"] for r in novelty_scores(df).collect()}
    assert got[1] == 1.0 and got[2] == 0.0 and got[5] == 0.0
    assert 0.0 < got[4] < 1.0  # shares the "the quick brown" prefix
