"""operators/lm.py: bigram LM NLL == pure-Python brute force, naive
Bayes recovers a separable labeling with exact deterministic tie-break,
DSIR log-ratios == brute force and rank target-like docs first."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from crgp_spark.operators.lm import (
    dsir_weights,
    lm_score,
    nb_classify,
    nb_train,
    ngram_lm,
)

LNQ = 1_000_000


def _toks(text: str) -> list[str]:
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split()


def _lnq(x: int) -> int:
    return math.floor(math.log(x) * LNQ + 0.5)


def _brute_lm(corpus: dict[int, str]):
    """Exact add-1 bigram NLL per doc, trained on the same corpus."""
    bc: dict[tuple[str, str], int] = {}
    cc: dict[str, int] = {}
    vocab: set[str] = set()
    for text in corpus.values():
        tk = _toks(text)
        vocab.update(tk)
        for a, b in zip(tk, tk[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
            cc[a] = cc.get(a, 0) + 1
    v = len(vocab)
    out = {}
    for doc_id, text in corpus.items():
        tk = _toks(text)
        nll = sum(
            _lnq(cc.get(a, 0) + v) - _lnq(bc.get((a, b), 0) + 1)
            for a, b in zip(tk, tk[1:])
        )
        n = max(len(tk) - 1, 0)
        out[doc_id] = (n, nll, nll / (n * LNQ) if n else 0.0)
    return out


def test_lm_matches_bruteforce(spark):
    corpus = {
        1: "the cat sat on the mat the cat sat",
        2: "the dog sat on the log",
        3: "a a a a a",
        4: "",
        5: "solo",
        6: "never seen pair never pair seen",
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_scaled"], r["avg_nll"])
        for r in lm_score(df, ngram_lm(df)).collect()
    }
    want = _brute_lm(corpus)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k


def test_lm_fluency_ordering(spark):
    """A doc made of the corpus's dominant pattern scores lower NLL
    than a doc of the same length made of one-off pairs."""
    rows = [(i, "alpha beta " * 10) for i in range(20)]
    rows.append((100, "alpha beta " * 5))  # in-distribution probe
    rows.append((101, "zeta eta theta iota kappa mu nu xi om pi"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nll = {
        r["doc_id"]: r["avg_nll"]
        for r in lm_score(df, ngram_lm(df)).collect()
    }
    assert nll[100] < nll[101]


def test_nb_recovers_separable_labels(spark):
    """Two vocab-disjoint classes: every doc classifies to its own
    label with add-1 smoothing; empty doc falls back to the prior
    argmax (the majority class)."""
    rows = (
        [(i, "apple banana cherry fruit " * 3, "fruit") for i in range(6)]
        + [(10 + i, "bolt nut screw metal " * 3, "tool") for i in range(3)]
        + [(99, "", "tool")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["pred"], r["hit"])
        for r in nb_classify(df, nb_train(df)).collect()
    }
    assert len(got) == len(rows)
    for i in range(6):
        assert got[i] == ("fruit", 1)
    for i in range(3):
        assert got[10 + i] == ("tool", 1)
    # empty doc: score = prior only; majority class is fruit (6 docs + 1?)
    # priors: fruit 6/10, tool 4/10 -> fruit
    assert got[99][0] == "fruit"


def test_nb_tie_breaks_to_smallest_label(spark):
    """Perfectly symmetric classes give identical scores; the argmax
    must deterministically pick the lexicographically smallest."""
    rows = [
        (1, "same words here", "aa"),
        (2, "same words here", "bb"),
        (3, "same words here", None),
    ]
    df = spark.createDataFrame(
        [(i, t, l) for i, t, l in rows[:2]],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r["pred"]
        for r in nb_classify(df, nb_train(df)).collect()
    }
    assert got == {1: "aa", 2: "aa"}


def _brute_dsir(corpus: dict[int, tuple[str, bool]], n_buckets=4096):
    def bucket(gram: str) -> int:
        return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % n_buckets

    rb: dict[int, int] = {}
    tb: dict[int, int] = {}
    for text, tgt in corpus.values():
        tk = _toks(text)
        for a, b in zip(tk, tk[1:]):
            h = bucket(f"{a} {b}")
            rb[h] = rb.get(h, 0) + 1
            if tgt:
                tb[h] = tb.get(h, 0) + 1
    r_tot, t_tot = sum(rb.values()), sum(tb.values())
    normq = _lnq(t_tot + n_buckets) - _lnq(r_tot + n_buckets)
    out = {}
    for doc_id, (text, _) in corpus.items():
        tk = _toks(text)
        w = 0
        n = 0
        for a, b in zip(tk, tk[1:]):
            h = bucket(f"{a} {b}")
            w += _lnq(tb.get(h, 0) + 1) - _lnq(rb.get(h, 0) + 1)
            n += 1
        w -= n * normq
        out[doc_id] = (n, w)
    return out


def test_dsir_matches_bruteforce_and_ranks_target_first(spark):
    corpus = {
        1: ("wiki style prose with citations and prose style", True),
        2: ("wiki style prose again with more prose", True),
        3: ("buy now cheap deals buy now", False),
        4: ("wiki style prose with citations", False),  # target-like raw doc
        5: ("cheap deals cheap deals cheap", False),
        6: ("", False),
    }
    df = spark.createDataFrame(
        [(k, t, tgt) for k, (t, tgt) in corpus.items()],
        "doc_id long, text string, is_t boolean",
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["w_scaled"], r["selected"])
        for r in dsir_weights(df, F.col("is_t")).collect()
    }
    want = _brute_dsir(corpus)
    for k, (n, w) in want.items():
        assert got[k][0] == n, k
        assert got[k][1] == w, k
        assert got[k][2] == (1 if w > 0 else 0), k
    # the target-like raw doc outranks the spammy ones (per-feature avg)
    avg = {k: (w / n if n else 0.0) for k, (n, w) in want.items()}
    assert avg[4] > avg[3] and avg[4] > avg[5]
