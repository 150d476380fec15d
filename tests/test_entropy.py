"""token_entropy: quantized-log entropy == pure-Python brute force,
empty/degenerate docs, monotonicity of the quality signal."""

from __future__ import annotations

import math
import re

from crgp_spark.operators.textstats import token_entropy

LNQ = 1_000_000


def _brute(text: str):
    toks = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split()
    if not toks:
        return (0, 0, 0, 0.0)
    cnt: dict[str, int] = {}
    for t in toks:
        cnt[t] = cnt.get(t, 0) + 1
    n = len(toks)

    def lnq(x: int) -> int:
        return math.floor(math.log(x) * LNQ + 0.5)

    h = n * lnq(n) - sum(c * lnq(c) for c in cnt.values())
    return (n, len(cnt), h, h / (n * LNQ))


def test_matches_bruteforce(spark):
    docs = [
        (1, "the cat sat on the mat the cat"),
        (2, "a a a a a a a a"),
        (3, "all tokens here are fully distinct words now"),
        (4, ""),
        (5, "  ,,, !!! "),
        (6, "x y " * 50),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["h_scaled"], r["entropy"])
        for r in token_entropy(df).collect()
    }
    assert set(got) == {d for d, _ in docs}
    for doc_id, text in docs:
        assert got[doc_id] == _brute(text), doc_id


def test_quality_signal_orders_docs(spark):
    """Repetitive < mixed < all-distinct entropy, and the all-repeat
    doc scores exactly 0 (h_scaled is an exact integer zero)."""
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "the cat sat on the mat again"),
            (3, "seven totally distinct unigram tokens appear here"),
        ],
        "doc_id long, text string",
    )
    e = {r["doc_id"]: r["entropy"] for r in token_entropy(df).collect()}
    h = {r["doc_id"]: r["h_scaled"] for r in token_entropy(df).collect()}
    assert h[1] == 0 and e[1] == 0.0
    assert e[1] < e[2] < e[3]
    # flat distribution over k distinct tokens ~ ln(k)
    assert abs(e[3] - math.log(7)) < 1e-5
