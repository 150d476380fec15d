from __future__ import annotations

import pytest

from crgp_spark.operators.snm import snm_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_snm_finds_prefix_neardups_and_skips_distant(spark):
    # 1<->2 share a near-identical prefix (1 edit in the first 16
    # chars); 3 is sorted far away; 4 is adjacent in sort order to 3
    # but beyond max_dist.
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamme delta"),
        (3, "zzz totally different text"),
        (4, "zzy also unrelated words"),
    ]
    out = snm_pairs(
        _docs(spark, rows), key_len=16, block_len=2, window=4, max_dist=2
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r.dist for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1
    assert all({a, b} != {3, 4} or d <= 2 for (a, b), d in pairs.items())
    assert not any({a, b} == {1, 3} for (a, b) in pairs)


def test_snm_blocked_ranking_matches_global_order(spark):
    # 12 docs spread over several blocks; verify the two-level ranking
    # reproduces the single global sort: compare against a brute-force
    # computation of the same semantics in Python.
    rows = [(i, f"{chr(97 + i % 5)}{chr(97 + i % 3)} doc {i:02d} body") for i in range(12)]
    window, key_len, max_dist = 3, 16, 10
    out = snm_pairs(
        _docs(spark, rows),
        key_len=key_len,
        block_len=1,
        window=window,
        max_dist=max_dist,
    ).collect()
    got = {(r.doc_a, r.doc_b) for r in out}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    keyed = sorted(((t[:key_len].lower(), i) for i, t in rows))
    want = set()
    for i in range(len(keyed)):
        for j in range(i + 1, min(i + window, len(keyed))):
            if lev(keyed[i][0], keyed[j][0]) <= max_dist:
                want.add((keyed[i][1], keyed[j][1]))
    assert got == want and want


def test_snm_rejects_bad_params(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        snm_pairs(d, window=1)
    with pytest.raises(ValueError):
        snm_pairs(d, key_len=4, block_len=8)
