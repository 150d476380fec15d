"""Transitive near-dup clustering: pair graph -> components -> reps."""

from __future__ import annotations

from crgp_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    neardup_clusters,
)


def _docs(spark):
    base = ["tok%d" % i for i in range(30)]
    t0 = " ".join(base)
    t1 = " ".join(base[:-1] + ["zzz"])  # J(t0,t1) ~ 0.8
    # differs from t1 in the first 6 tokens and from t0 additionally in
    # the last: J(t1,t2) = 22/34 > 0.6 >= 21/35 = J(t0,t2) (strict
    # threshold) — 0 and 2 connect ONLY via 1
    t2 = " ".join(
        ["aaa", "bbb", "ccc", "ddd", "eee", "fff"] + base[6:-1] + ["zzz"]
    )
    t3 = "completely different text about other things entirely"
    return spark.createDataFrame(
        [(0, t0), (1, t1), (2, t2), (3, t3)], "doc_id long, text string"
    )


def test_chain_is_transitive(spark):
    docs = _docs(spark)
    ver = jaccard_pairs(docs, lsh_candidate_pairs(docs, n_hashes=12, band_size=2))
    # precondition: the chain has no direct 0-2 edge
    assert sorted((r["a"], r["b"]) for r in ver.collect()) == [(0, 1), (1, 2)]
    out = neardup_clusters(spark, docs, n_hashes=12, band_size=2)
    assert sorted(tuple(r) for r in out.collect()) == [
        (0, 0, 3),
        (1, 0, 3),
        (2, 0, 3),
        (3, 3, 1),
    ]


def test_no_pairs_all_singletons(spark):
    docs = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon"), (9, "one two three four five")],
        "doc_id long, text string",
    )
    out = neardup_clusters(spark, docs, n_hashes=12, band_size=2)
    assert sorted(tuple(r) for r in out.collect()) == [(7, 7, 1), (9, 9, 1)]
