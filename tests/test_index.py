from __future__ import annotations

import pytest

from crgp_spark.operators.index import inverted_index


def _docs(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the cat, the hat"),
        (3, "  hat trick"),  # leading separators: empty first split slot
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _p(doc, pos):
    return f"{doc:020d}:{pos:020d}"


def test_index_counts_and_postings(spark):
    got = {
        r["token"]: r for r in inverted_index(_docs(spark)).collect()
    }
    assert set(got) == {"the", "cat", "sat", "hat", "trick"}
    the = got["the"]
    assert (the["n_docs"], the["n_occ"]) == (2, 3)
    assert the["postings"] == ",".join(
        [_p(1, 0), _p(2, 0), _p(2, 2)]
    )
    # doc 3: "  hat trick" splits to ["", "hat", "trick"] -> hat @ 1
    hat = got["hat"]
    assert hat["postings"] == ",".join([_p(2, 3), _p(3, 1)])


def test_postings_cap(spark):
    docs = _docs(spark)
    got = {
        r["token"]: r
        for r in inverted_index(docs, max_postings=2).collect()
    }
    the = got["the"]
    assert (the["n_docs"], the["n_occ"]) == (2, 3)  # counts uncapped
    assert the["postings"] == ",".join([_p(1, 0), _p(2, 0)])


def test_validation(spark):
    with pytest.raises(ValueError):
        inverted_index(_docs(spark), max_postings=0)


def test_keyword_search(spark):
    from crgp_spark.operators.index import keyword_search

    docs = spark.createDataFrame(
        [
            (1, "cat hat cat"),       # cat:2 hat:1 -> score 3
            (2, "cat hat cat hat"),   # 2+2 -> 4
            (3, "cat only here"),     # missing hat -> excluded
            (4, "hat hat hat"),       # missing cat -> excluded
        ],
        "doc_id: long, text: string",
    )
    got = [
        (r["doc_id"], r["score"])
        for r in keyword_search(docs, ["cat", "hat"]).collect()
    ]
    assert got == [(2, 4), (1, 3)]


def test_keyword_search_validation(spark):
    import pytest as _pytest

    from crgp_spark.operators.index import keyword_search

    docs = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with _pytest.raises(ValueError):
        keyword_search(docs, [])
    with _pytest.raises(ValueError):
        keyword_search(docs, ["a", "a"])
