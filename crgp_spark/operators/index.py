"""Inverted-index construction — the search-engine primitive the
text family (tfidf, ngrams, winnowing) was still missing.

Builds the classic postings table: for every token, how many
documents and occurrences carry it, plus a capped, deterministically
ordered sample of ``doc:pos`` postings (the head of the posting list
an index shard would persist).  Everything is expression-level:
tokenize with ``split`` (positions = indices in the RAW split array,
empties filtered after enumeration so both engines agree), one
exchange on the token.

Scale shape at 100 TB: the tokenize+posexplode is scan-side; the
counts are map-side-combinable aggregates; the postings cap is a
rank-limit window (Catalyst's WindowGroupLimit prunes each partition
to its local top-K before the shuffle — the `neighbor_sample` idiom),
so a hot token ("the") costs O(K), not O(occurrences), past the
count aggregation.  Postings are strings ``lpad(doc):lpad(pos)``
(the `functions.ord_key` idiom) so lexicographic order == numeric
order and the list head is the lowest (doc, pos) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 16,
) -> DataFrame:
    """``(token, n_docs, n_occ, postings)`` per token — ``postings``
    is the comma-joined head (lowest ``doc:pos``, at most
    ``max_postings``) of the posting list."""
    if max_postings < 1:
        raise ValueError("max_postings must be >= 1")
    from crgp_spark.functions import ord_key

    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\W+")).alias(
            "pos", "token"
        ),
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.countDistinct("doc").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    entry = ord_key("doc", "pos")
    w = Window.partitionBy("token").orderBy(entry.asc())
    head = (
        toks.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_postings)
        .groupBy("token")
        .agg(
            F.array_join(F.array_sort(F.collect_list(entry)), ",").alias(
                "postings"
            )
        )
    )
    return counts.join(head, "token")


def keyword_search(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Conjunctive (AND) keyword search with term-frequency ranking:
    documents containing EVERY term, scored by total occurrences —
    ``(doc_id, score)``, top ``top_k`` by (score desc, doc_id).

    The query-side twin of `inverted_index`: per-doc term counts are
    one conditional-count aggregate per term inside ONE
    groupBy(doc) — no per-term joins, no index lookup round-trips —
    then a ``HAVING every tf > 0`` filter and a TakeOrderedAndProject
    top-k.  Integer scores keep both engines bit-identical (no IDF
    logs — engines' ``log`` ULPs differ; BM25 would go behind a
    rows-only gate)."""
    if not terms:
        raise ValueError("need at least one search term")
    if len(set(terms)) != len(terms):
        raise ValueError("duplicate search terms")
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\W+")).alias("token"),
    ).where(F.col("token") != "")
    aggs = [
        F.sum(F.when(F.col("token") == t, 1).otherwise(0)).alias(f"_tf{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = toks.groupBy("doc").agg(*aggs)
    cond = F.lit(True)
    for i in range(len(terms)):
        cond = cond & (F.col(f"_tf{i}") > 0)
    score = sum(
        (F.col(f"_tf{i}") for i in range(1, len(terms))),
        F.col("_tf0"),
    )
    return (
        per_doc.where(cond)
        .select(F.col("doc").alias(id_col), score.cast("long").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_k)
    )
