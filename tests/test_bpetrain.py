"""bpe_train vs a sequential python BPE reference."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from crgp_spark.operators.bpetrain import bpe_encode, bpe_train


def _py_bpe(texts, merges, with_state=False):
    """Classic sequential word-level BPE with lexicographic tiebreak
    and leftmost-non-overlapping merging."""
    vocab = Counter()
    for t in texts:
        nt = re.sub("[^a-z0-9]+", " ", t.lower()).strip()
        for w in nt.split():
            vocab[w] += 1
    state = {w: list(w) for w in vocab}
    rules = []
    for rnd in range(1, merges + 1):
        pairs = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        (lhs, rhs), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rnd, lhs, rhs, cnt))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return (rules, state) if with_state else rules


def _run(spark, texts, merges):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        (r["merge_round"], r["lhs"], r["rhs"], r["cnt"])
        for r in bpe_train(df, merges=merges).collect()
    )
    return got


def test_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the lower league follows newer, slower rules",
        "low lower lowest newest widest the the the",
    ]
    assert _run(spark, texts, 6) == _py_bpe(texts, 6)


def test_overlap_merges_leftmost_nonoverlapping(spark):
    # 'aaaa' with winning pair (a,a): leftmost fold gives (aa)(aa) --
    # NOT (a)(aa)(a) -- and 'aaa' gives (aa)(a)
    texts = ["aaaa aaa baa"]
    got = _run(spark, texts, 2)
    want = _py_bpe(texts, 2)
    assert got == want
    assert got[0][1:3] == ("a", "a")
    # round 2's winner exists only if round 1 folded leftmost: after
    # (a,a)->aa the corpus has pairs (aa,aa), (aa,a), (b,aa)
    assert got[1][1] in ("aa", "b")


def test_multichar_symbols_never_false_match(spark):
    # after merging (a,x) the symbol 'ax' must not be split by a later
    # (x,y) rule even though 'x y' appears inside '(ax)(y)' unframed
    texts = ["ax ax ax xy xy"]  # pairs: (a,x) x3, (x,y) x2
    got = _run(spark, texts, 2)
    want = _py_bpe(texts, 2)
    assert got == want
    assert got[0][1:3] == ("a", "x")
    assert got[1][1:3] == ("x", "y")


def test_validates_merges(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train(df, merges=0)


def test_encode_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the lower league follows newer, slower rules",
        "low lower lowest newest widest the the the",
    ]
    _, state = _py_bpe(texts, 5, with_state=True)
    want = []
    for i, t in enumerate(texts):
        nt = re.sub("[^a-z0-9]+", " ", t.lower()).strip()
        want.append((i, sum(len(state[w]) for w in nt.split() if w)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = bpe_encode(df, bpe_train(df, merges=5))
    got = sorted((r["doc_id"], r["n_tokens"]) for r in out.collect())
    assert got == sorted(want)


def test_encode_with_handwritten_rules(spark):
    # rule (q,q): 'qq' folds to one symbol; 'zzz' is untouched (3)
    docs = spark.createDataFrame(
        [(0, "qq zzz qq")], "doc_id long, text string"
    )
    rules = spark.createDataFrame(
        [(1, "q", "q")], "merge_round int, lhs string, rhs string"
    )
    out = bpe_encode(docs, rules).collect()
    assert [(r["doc_id"], r["n_tokens"]) for r in out] == [(0, 1 + 3 + 1)]


def test_encode_rule_order_respected(spark):
    # (a,b)->ab then (ab,c)->abc: 'abc' must become ONE symbol; applying
    # in the wrong order would leave two
    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    rules = spark.createDataFrame(
        [(2, "ab", "c"), (1, "a", "b")],
        "merge_round int, lhs string, rhs string",
    )
    assert bpe_encode(docs, rules).collect()[0]["n_tokens"] == 1
