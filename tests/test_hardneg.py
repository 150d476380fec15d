"""hard_negatives (dedup.py): mirror over Spark-extracted candidates."""

from __future__ import annotations

import re
from itertools import combinations

from crgp_spark.operators.dedup import hard_negatives, lsh_candidate_pairs


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )


def _shingles(text, k=3):
    toks = re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
    if not toks:
        return set()
    if len(toks) <= k:
        return {" ".join(toks[i : i + k]) for i in range(max(len(toks) - k, 0) + 1)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_mirror_over_lsh_candidates(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    texts = [base]
    words = base.split()
    for j in range(1, 8):
        mod = list(words)
        for p in range(j):
            mod[(3 * p + j) % len(mod)] = f"tok{j}_{p}"
        texts.append(" ".join(mod))
    df = _docs(spark, texts)
    cands = {
        (r.a, r.b)
        for r in lsh_candidate_pairs(df, n_hashes=12, band_size=1).collect()
    }
    sh = {i: _shingles(t) for i, t in enumerate(texts)}
    lo, hi, per_anchor = (1, 10), (6, 10), 3
    mid = []
    for a, b in sorted(cands):
        inter = len(sh[a] & sh[b])
        uni = len(sh[a] | sh[b])
        if inter * lo[1] >= lo[0] * uni and inter * hi[1] < hi[0] * uni:
            mid.append((a, b, inter, uni))
    want = {}
    both = [(a, b, i, u) for a, b, i, u in mid] + [
        (b, a, i, u) for a, b, i, u in mid
    ]
    per = {}
    for anchor, neg, i, u in both:
        per.setdefault(anchor, []).append((-(i / u), neg, i, u))
    for anchor, lst in per.items():
        for s, neg, i, u in sorted(lst)[:per_anchor]:
            want[(anchor, neg)] = (i, u)
    got = {
        (r.anchor, r.neg): (r.inter, r.uni)
        for r in hard_negatives(
            df, band_size=1, lo=lo, hi=hi, per_anchor=per_anchor
        ).collect()
    }
    assert got == want
    assert len(got) > 0  # the band actually caught something


def test_excludes_near_duplicates_and_unrelated(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",  # near-dup of 0
        "completely different words entirely unrelated content here now",
    ]
    df = _docs(spark, texts)
    rows = hard_negatives(df, per_anchor=5).collect()
    # pair (0,1) is a near-duplicate (jaccard >= 0.6) -> excluded
    assert all({r.anchor, r.neg} != {0, 1} for r in rows)
