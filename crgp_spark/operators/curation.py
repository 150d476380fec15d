"""Corpus-curation operators: benchmark decontamination and
repetition-based quality signals — the remaining curation half of a
training-data pipeline (first-class per the task brief; the reference
engine has no text ops, its strings are parsed-and-discarded,
``twitter/get.rs:56-76``).

Both operators follow the module family's contract: pure JVM
expressions plus distributed groupBys (no UDFs, no driver-side data),
and every emitted number is integer-derived or passed through
``decimal_round`` so the DuckDB oracle twin is bit-identical.

Scale shape at 100 TB:

* ``decontaminate`` — the corpus side is one scan-shaped explode of
  word n-grams followed by a semi-join against the benchmark's gram
  set.  Benchmark (eval) sets are tiny relative to the training corpus
  by construction, so the gram set is broadcast by default
  (``broadcast_benchmark``); with it disabled the semi-join is a
  plain shuffled hash join on the 32-char gram key — either way no
  all-pairs work and no skew (gram keys are md5-uniform).
* ``repetition_stats`` — one explode per gram order, each feeding a
  map-side-combinable ``groupBy(doc_id, gram)``; the per-doc top-1 is
  a PARTITIONED window (never global).  Everything shuffles on
  ``doc_id`` only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round
from crgp_spark.operators.textstats import normalize_text, tokens


def _word_grams(toks, n: int):
    """md5 hex of every word ``n``-gram (same construction as
    winnowing_fingerprints / word_shingles so oracles share one idiom)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    benchmark_ids: DataFrame,
    n: int = 4,
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    at least one word ``n``-gram with a held-out benchmark (eval) set —
    the standard test-set-overlap removal step of an LLM data pipeline
    (n-gram collision, as in GPT-3 App. C / PaLM-style 8-gram rules;
    ``n`` is a dial, small here because the test corpus is tiny).

    ``benchmark_ids``: one-column ``doc_id`` DataFrame naming the
    benchmark members (they are excluded from the output — a benchmark
    doc is not its own contamination).  Returns ``(doc_id,
    contaminated)`` for every NON-benchmark document.

    Plan: grams are exploded once; the benchmark gram set is built by a
    semi-join on ``doc_id`` and (by default) broadcast into the
    corpus-side semi-join, so the corpus is touched in a single
    scan-shaped pass with no self-join.
    """
    toks = tokens(normalize_text(F.col(text_col)))
    grams = docs.select("doc_id", F.explode(_word_grams(toks, n)).alias("g"))

    bench = benchmark_ids.select("doc_id")
    bench_b = F.broadcast(bench)  # id list: always tiny
    bench_grams = (
        grams.join(bench_b, "doc_id", "left_semi").select("g").distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)

    train = docs.select("doc_id").join(bench_b, "doc_id", "left_anti")
    hits = (
        grams.join(bench_b, "doc_id", "left_anti")
        .join(bench_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("_hit"), F.lit(False)).alias("contaminated"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition signals, exact and cross-engine
    deterministic (Rae et al. 2021 §A1.1 use these as hard filters):

    * ``n_tokens`` — whitespace token count of the normalized text;
    * ``dup_token_frac`` — ``1 − distinct/total`` tokens (4dp);
    * ``top_bigram`` / ``top_bigram_n`` — the most frequent word
      bigram (ties: lexicographically smallest) and its count;
    * ``dup_trigram_frac`` — fraction of trigram OCCURRENCES whose
      gram appears ≥2× in the document (4dp) — the "fraction of
      characters in duplicated n-grams" rule with character weighting
      dropped so the ratio stays integer-derived and exact.

    Documents with fewer than 2 (3) tokens get a NULL top bigram
    (zero trigram fraction). One explode per gram order, partitioned
    window for the top-1 — shuffles on ``doc_id`` only.
    """
    toks = tokens(normalize_text(F.col(text_col)))
    base = docs.select(
        "doc_id",
        F.size(toks).alias("_n"),
        F.size(F.array_distinct(toks)).alias("_nd"),
        toks.alias("_t"),
    )

    def gram_counts(order: int) -> DataFrame:
        grams = F.when(
            F.size(F.col("_t")) >= order,
            F.transform(
                F.sequence(F.lit(0), F.size(F.col("_t")) - order),
                lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i + 1, order)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return (
            base.select("doc_id", F.explode(grams).alias("gram"))
            .groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    w = Window.partitionBy("doc_id").orderBy(F.col("c").desc(), F.col("gram"))
    top_bi = (
        gram_counts(2)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top_bigram"),
            F.col("c").cast("int").alias("top_bigram_n"),
        )
    )
    tri = gram_counts(3).groupBy("doc_id").agg(
        F.sum("c").alias("_tot"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
            "_dup"
        ),
    )

    return (
        base.join(top_bi, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_n").cast("int").alias("n_tokens"),
            decimal_round(
                F.when(F.col("_n") == 0, F.lit(0.0)).otherwise(
                    (F.col("_n") - F.col("_nd")).cast("double") / F.col("_n")
                ),
                4,
            ).alias("dup_token_frac"),
            "top_bigram",
            "top_bigram_n",
            decimal_round(
                F.when(
                    F.coalesce(F.col("_tot"), F.lit(0)) == 0, F.lit(0.0)
                ).otherwise(F.col("_dup").cast("double") / F.col("_tot")),
                4,
            ).alias("dup_trigram_frac"),
        )
    )


def remove_boilerplate(
    docs: DataFrame,
    seg_words: int = 4,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_boilerplate: bool = True,
) -> DataFrame:
    """Cross-document boilerplate removal (CCNet / RefinedWeb line-dedup
    generalized to token segments): a document is re-segmented into
    non-overlapping ``seg_words``-token chunks of its normalized text; a
    segment that occurs in >= ``min_docs`` DISTINCT documents is corpus
    boilerplate (headers, footers, navigation chrome, license blurbs)
    and is dropped from every document.  Returns ``(doc_id, clean_text,
    n_segs, n_removed)`` with the surviving segments rejoined in
    original order.

    Segments rather than literal ``\\n``-lines so the operator is
    meaningful for single-line corpora too; on real web text pass the
    line split upstream (one segment per line) and ``seg_words`` large.

    Scale shape at 100 TB: one scan-shaped segmentation (pure array
    expressions), one map-side-combinable ``groupBy(segment)`` with a
    partial COUNT(DISTINCT doc) — boilerplate segments are by
    definition heavy keys, which is exactly what partial aggregation
    absorbs — and one anti-join back.  The boilerplate set is tiny
    relative to the corpus (it is the *repeated* fraction), so it is
    broadcast by default; disable to fall back to a shuffled anti-join
    on the segment key.  Reassembly shuffles on ``doc_id`` only.
    """
    toks = tokens(normalize_text(F.col(text_col)))
    segs = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.size(toks) - 1) / F.lit(seg_words)),
            ),
            lambda i: F.array_join(
                F.slice(toks, i * seg_words + 1, seg_words), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(F.col(id_col).alias("doc_id"), segs.alias("_segs"))
    ex = base.select("doc_id", F.posexplode("_segs").alias("pos", "seg"))
    boiler = (
        ex.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("seg")
    )
    if broadcast_boilerplate:
        boiler = F.broadcast(boiler)
    kept = ex.join(boiler, "seg", "left_anti")
    re_agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("_clean"),
        F.count(F.lit(1)).alias("_kept"),
    )
    return base.join(re_agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("_clean"), F.lit("")).alias("clean_text"),
        F.size("_segs").cast("int").alias("n_segs"),
        (F.size("_segs") - F.coalesce(F.col("_kept"), F.lit(0)))
        .cast("int")
        .alias("n_removed"),
    )


#: (name, pattern, replacement) — applied strictly in this order.  The
#: patterns are restricted to constructs with identical semantics in
#: Spark's Java regex and DuckDB's RE2 (character classes, bounded
#: quantifiers; no lookarounds, no backrefs, no \p classes), and both
#: engines scan left-to-right non-overlapping, so the staged
#: count-then-replace below is bit-identical cross-engine.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("url", "https?://[a-zA-Z0-9./_-]+", "<URL>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
]


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction: mask emails, URLs, IPv4 addresses and
    NNN-NNN-NNNN phone numbers with typed placeholder tokens and count
    each category — the standard pre-training scrub step (C4/RefinedWeb
    drop or mask contact strings before anything else sees the text).

    Each category is counted on the text AS IT STANDS when that
    pattern's turn comes (emails first, so an address inside a URL
    query string is attributed to the email pass) and then replaced;
    the oracle twin stages identically.  Returns ``(id_col, redacted,
    n_email, n_url, n_ipv4, n_phone)``.

    Scale shape: pure ``regexp_count``/``regexp_replace`` column
    expressions — whole-stage codegen at scan speed, no shuffle, no
    UDF; at 100 TB this is exactly as expensive as reading the text
    column once.
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select(F.col(id_col), cur.alias("redacted"), *counts)


def novelty_scores(
    docs: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Temporal novelty per document: the fraction of its distinct word
    k-gram shingles whose FIRST corpus occurrence (min doc_id — ingest
    order) is this document.  Low novelty = the doc mostly restates
    earlier corpus content (boilerplate families, syndication, quote
    chains); the standard keep-the-first curation signal between exact
    dedup (novelty 0 for a verbatim repeat) and MinHash near-dup.
    Returns ``(doc_id, n_grams, n_novel, novelty)``; empty docs score
    (0, 0, 0.0).

    Cross-engine exactness: counts are exact BIGINTs and ``novelty`` is
    one IEEE division of identical integers.

    Scale shape: explode + a map-side-combinable MIN per gram + one
    co-keyed join back on the gram hash + a per-doc fold — the
    decontaminate plan shape, linear in corpus grams, no windows, no
    all-pairs anything."""
    from crgp_spark.operators.dedup import word_shingles

    g = docs.select(
        "doc_id", F.explode(word_shingles(F.col(text_col), k)).alias("g")
    )
    first = g.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per = (
        g.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.col("n_novel").cast("double")
                / F.col("n_grams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("novelty"),
        )
    )
