"""Curation operators: decontamination + repetition stats (exact
hand-computed expectations, including the short-document edge cases)."""

from __future__ import annotations

from crgp_spark.operators.curation import decontaminate, repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_ngram_overlap(spark):
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma delta epsilon"),  # benchmark member
            (1, "x alpha beta gamma delta y"),      # shares a 4-gram -> hit
            (2, "alpha beta gamma zeta eta"),       # only 3 shared -> clean
            (3, "unrelated words entirely here"),   # clean
            (4, "tiny doc"),                        # < n tokens -> clean
        ],
    )
    bench = _docs(spark, [(0, "")]).select("doc_id")
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, bench, n=4).collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: False}  # 0 excluded


def test_decontaminate_broadcast_off_same_result(spark):
    docs = _docs(
        spark,
        [(i, f"w{i} alpha beta gamma delta w{i + 1}") for i in range(20)],
    )
    bench = docs.filter("doc_id < 2").select("doc_id")
    a = sorted(map(tuple, decontaminate(docs, bench, n=4).collect()))
    b = sorted(
        map(
            tuple,
            decontaminate(
                docs, bench, n=4, broadcast_benchmark=False
            ).collect(),
        )
    )
    assert a == b and len(a) == 18
    assert all(flag for _, flag in a)  # every doc shares "alpha beta gamma delta"


def test_repetition_stats_exact(spark):
    docs = _docs(
        spark,
        [
            # 6 tokens, 3 distinct; bigrams: "a b"x2,"b a"x2,"b c" ->
            # top "a b" (tie vs "b a" resolved lexicographically);
            # trigrams: "a b a","b a b","a b c","b c a"? no: a b a b c a
            # -> grams: "a b a","b a b","a b c","b c a" all unique -> 0.0
            (0, "a b a b c a"),
            (1, "x x x x"),   # 4 tokens 1 distinct; "x x"x3; "x x x"x2
            (2, "solo"),      # 1 token: no bigrams/trigrams
            (3, "two words"),  # bigram exists, no trigram
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[0]["n_tokens"] == 6
    assert got[0]["dup_token_frac"] == 0.5
    assert got[0]["top_bigram"] == "a b" and got[0]["top_bigram_n"] == 2
    assert got[0]["dup_trigram_frac"] == 0.0
    assert got[1]["top_bigram"] == "x x" and got[1]["top_bigram_n"] == 3
    assert got[1]["dup_token_frac"] == 0.75
    assert got[1]["dup_trigram_frac"] == 1.0  # both trigrams are "x x x"
    assert got[2]["top_bigram"] is None and got[2]["top_bigram_n"] is None
    assert got[2]["dup_trigram_frac"] == 0.0
    assert got[3]["top_bigram"] == "two words" and got[3]["top_bigram_n"] == 1


def test_redact_pii_masks_and_counts(spark):
    from crgp_spark.operators.curation import redact_pii

    docs = _docs(
        spark,
        [
            (0, "mail bob@corp.io and visit https://a.io/x from 10.1.2.3"),
            (1, "call 555-123-4567 or 555-000-1111 today"),
            (2, "nothing personal here"),
            (3, ""),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in redact_pii(docs).collect()}
    assert got[0]["redacted"] == "mail <EMAIL> and visit <URL> from <IP>"
    assert (got[0]["n_email"], got[0]["n_url"], got[0]["n_ipv4"]) == (1, 1, 1)
    assert got[1]["redacted"] == "call <PHONE> or <PHONE> today"
    assert got[1]["n_phone"] == 2 and got[1]["n_email"] == 0
    assert got[2]["redacted"] == "nothing personal here"
    assert all(got[3][f"n_{c}"] == 0 for c in ("email", "url", "ipv4", "phone"))


def test_redact_pii_email_beats_url_order(spark):
    from crgp_spark.operators.curation import redact_pii

    # an address embedded in a URL query string: the email pass runs
    # first by contract, so the host tail is consumed as an email
    docs = _docs(spark, [(0, "see https://t.co/r?to=a@b.com end")])
    row = redact_pii(docs).collect()[0]
    assert row["n_email"] == 1 and "<EMAIL>" in row["redacted"]


def test_remove_boilerplate_drops_repeated_segments(spark):
    from crgp_spark.operators.curation import remove_boilerplate

    docs = _docs(
        spark,
        [
            (0, "a b c d e f g h"),        # segs: "a b c d" | "e f g h"
            (1, "a b c d x"),              # segs: "a b c d" | "x"
            (2, "unique words only here kept"),
            (3, ""),                       # no tokens -> 0 segments
            (4, "a b c d"),                # everything is boilerplate
        ],
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_segs"], r["n_removed"])
        for r in remove_boilerplate(docs, seg_words=4, min_docs=2).collect()
    }
    assert got[0] == ("e f g h", 2, 1)
    assert got[1] == ("x", 2, 1)
    assert got[2] == ("unique words only here kept", 2, 0)
    assert got[3] == ("", 0, 0)
    assert got[4] == ("", 1, 1)


def test_remove_boilerplate_preserves_order_and_duplicates(spark):
    from crgp_spark.operators.curation import remove_boilerplate

    # the SAME within-doc segment repeated must survive twice (only
    # cross-document repetition is boilerplate at min_docs=3), and
    # order must be original, not lexical
    docs = _docs(
        spark,
        [
            (0, "zz yy zz yy tail"),
            (1, "other text entirely differs"),
        ],
    )
    got = remove_boilerplate(docs, seg_words=2, min_docs=3).collect()
    row0 = next(r for r in got if r["doc_id"] == 0)
    assert row0["clean_text"] == "zz yy zz yy tail"
    assert row0["n_segs"] == 3 and row0["n_removed"] == 0


def test_remove_boilerplate_broadcast_off_same_result(spark):
    from crgp_spark.operators.curation import remove_boilerplate

    docs = _docs(
        spark,
        [(i, f"common head seg w{i} uniq tail w{i + 1}") for i in range(12)],
    )
    a = sorted(map(tuple, remove_boilerplate(docs, seg_words=3).collect()))
    b = sorted(
        map(
            tuple,
            remove_boilerplate(
                docs, seg_words=3, broadcast_boilerplate=False
            ).collect(),
        )
    )
    assert a == b
    # "common head seg" repeats in all 12 docs -> removed everywhere
    assert all(row[3] >= 1 for row in a)
