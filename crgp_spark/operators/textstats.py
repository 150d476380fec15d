"""Text analysis over document tables: token counting, quality scoring,
language-ID heuristic, fingerprinting — the text half of a
training-data pipeline (first-class per the task brief; the reference
has no text ops, its strings are parsed-and-discarded,
``twitter/get.rs:56-76``).

Every function is pure JVM expressions (``pyspark.sql.functions``), no
UDFs — so at 100 TB these run inside whole-stage codegen at scan speed,
and each has an exact ANSI-SQL twin used by the DuckDB oracle harness
(expressions below are deliberately restricted to constructs with
identical semantics in both engines; e.g. ``md5``, simple regex classes,
integer arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round

#: tiny per-language stopword marker sets (shared with the SQL oracle)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "los", "en", "un", "por"],
    "fr": ["le", "la", "les", "des", "et", "une", "est", "dans"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
}

_PUNCT_RE = "[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars, n_distinct_tokens, avg_token_len)."""
    toks = tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        decimal_round(
            F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
                F.aggregate(
                    F.transform(toks, lambda t: F.length(t)),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double")
                / F.size(toks)
            ),
            4,
        ).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristic in [0,1]:
    0.4·min(1, tokens/50) + 0.3·type-token-ratio + 0.2·(1 − punct-ratio)
    + 0.1·stopword-presence. Rounded to 4 decimals (identical arithmetic
    in the SQL oracle)."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), _PUNCT_RE, "")
    )
    ttr = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(toks)).cast("double") / n_tok
    )
    en_stop = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_MARKERS["en"]]))
    )
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok.cast("double") / 50)
        + F.lit(0.3) * ttr
        + F.lit(0.2) * (F.lit(1.0) - punct.cast("double") / n_chars)
        + F.lit(0.1) * F.when(en_stop > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        decimal_round(score, 4).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: the language whose marker words hit
    the most distinct matches wins; ties resolve in fixed order
    en > es > fr > de; zero hits -> 'und'."""
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    hits = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["es"] == best, F.lit("es"))
        .when(hits["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return docs.select("doc_id", pred.alias("pred_lang"))


#: GPT-2-style pre-tokenizer shape: contractions, letter runs, digit
#: runs, punctuation runs, whitespace handled by the split — restricted
#: to a character-class form whose semantics are identical in Spark's
#: Java regex and DuckDB's RE2 (no \p classes, no lookarounds).
_BPE_RE = "'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"


def bpe_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bpe_tokens): count of BPE-ish pre-tokens — the
    regex-segmentation half of a BPE tokenizer (the merge table is
    model-specific and out of scope). JVM ``regexp_extract_all`` at scan
    speed; exact SQL twin via DuckDB's ``regexp_extract_all``."""
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, non-alphanumeric
    runs collapsed to single spaces, trimmed."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — md5 of the normalized text; identical duplicate
    detection key in Spark and the SQL oracle."""
    return docs.select(
        "doc_id", F.md5(normalize_text(F.col(text_col))).alias("fp")
    )


def winnowing_fingerprints(
    docs: DataFrame, text_col: str = "text", k: int = 5, w: int = 4
) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (Schleimer et
    al., MOSS): hash every word ``k``-gram of the normalized text, slide
    a window of ``w`` consecutive gram hashes, keep each window's
    minimum, output the distinct selected hashes —
    ``(doc_id, fp)`` exploded, one row per fingerprint.

    Robustness property: any shared substring of length >= k+w-1 words
    yields at least one shared fingerprint. All array expressions (JVM
    codegen); the hash is the md5 hex string and selection is
    lexicographic min, so the SQL oracle is bit-identical.

    Shape note: the gram hashes are posexploded to rows and the window
    minimum is a sliding ROWS frame partitioned by doc_id. Nesting the
    gram array inside a second ``F.transform`` (the naive expression
    form) re-evaluates the whole O(len) md5 array once PER outer window
    element — quadratic md5 work that cost 100+ s at sf0.01; the
    exploded form hashes each gram exactly once and is linear."""
    toks = tokens(normalize_text(F.col(text_col)))
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    g = docs.where(n > 0).select(
        "doc_id", F.posexplode(grams).alias("i", "gh")
    )
    # both frames share (partitionBy doc_id, orderBy i) => one WindowExec
    win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    tot = Window.partitionBy("doc_id").orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        g.select(
            "doc_id",
            "i",
            F.min("gh").over(win).alias("fp"),
            F.count(F.lit(1)).over(tot).alias("_n"),
        )
        # valid window starts: 0 .. max(n_grams - w, 0), matching the
        # truncated final window of the array formulation
        .where(F.col("i") <= F.greatest(F.col("_n") - w, F.lit(0)))
        .select("doc_id", "fp")
        .distinct()
    )


def ngram_topk(
    docs: DataFrame, n: int = 2, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus-level word n-gram frequency: the top-``k`` most frequent
    n-grams of the normalized corpus as ``(rk, gram, n_occurrences)``
    with a deterministic (count desc, gram asc) total order.

    The vocabulary-building primitive of a tokenizer-training pipeline
    (counting EVERY occurrence — unlike ``word_shingles``, which
    dedupes per document for set similarity).  Scale shape: the explode
    is scan-side, the count is a map-side-combinable groupBy on the
    gram, and the top-k compiles to TakeOrderedAndProject — no global
    sort, no per-row Python."""
    toks = tokens(normalize_text(F.col(text_col)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    agg = (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("gram"))
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("rk", "gram", "n_occurrences")
    )


def tfidf_topk(docs: DataFrame, k_top: int = 5, text_col: str = "text") -> DataFrame:
    """Per-document top-``k_top`` terms by smoothed TF-IDF:
    ``tf · (ln((N+1)/(df+1)) + 1)`` (the sklearn smoothing), ranked
    tfidf DESC then term ASC.  Returns (doc_id, rk, term, tf, df,
    tfidf) with tfidf rounded at 6dp via ``decimal_round``.

    Scale shape: one explode + two map-side-combinable groupBys, the
    corpus size folded in as a broadcast 1-row aggregate (no driver
    collect), and a per-doc (not global) window for the top-k.  Equal
    raw scores can only arise from equal (tf, df) pairs — both engines
    then agree exactly — so the term tie-break makes the ranking
    cross-engine deterministic despite float scoring."""
    toks = docs.select(
        "doc_id",
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    raw = F.col("tf") * (
        F.log(
            (F.col("n_docs") + 1).cast("double")
            / (F.col("df") + 1).cast("double")
        )
        + 1
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("raw", raw)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("raw").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k_top)
        .select(
            "doc_id",
            F.col("rk").cast("int").alias("rk"),
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
            decimal_round(F.col("raw"), 6).alias("tfidf"),
        )
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    k_top: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations (statistically associated word bigrams) by
    LIFT — the log-free core of PMI, kept as an exact ratio so the
    oracle matches bit-for-bit: ``lift = p(xy) / (p(x)·p(y))`` with
    ``p(xy) = n_xy/N_bi`` and ``p(x) = n_x/N_uni``, each division done
    in the SAME order in both engines and the result 4dp-rounded.
    Returns ``(w1, w2, n, lift)`` for bigrams with ``n >= min_count``,
    ranked by (lift desc, w1, w2) — deterministic.

    Scale shape: one explode per gram order feeding map-side-combinable
    groupBys, corpus totals as broadcast 1-row cross-joins (the Q11
    scalar idiom), top-k = TakeOrderedAndProject."""
    toks = tokens(normalize_text(F.col(text_col)))
    base = docs.select(toks.alias("_t"))
    uni = (
        base.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("nw"))
    )
    bi_arr = F.when(
        F.size(F.col("_t")) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("_t")) - 2),
            lambda i: F.struct(
                F.element_at("_t", i + 1).alias("w1"),
                F.element_at("_t", i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = (
        base.select(F.explode(bi_arr).alias("_b"))
        .select(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    n_uni = uni.agg(F.sum("nw").alias("_nu"))
    # the bigram population total covers ALL bigrams, not just the
    # min_count survivors
    n_bi_tot = base.select(F.size(F.col("_t")).alias("s")).agg(
        F.sum(F.greatest(F.col("s") - 1, F.lit(0))).alias("_nb")
    )
    # vocabulary joins stay un-hinted: a 100 TB corpus vocabulary can
    # exceed broadcast size, and the keys are uniform — AQE decides
    scored = (
        bi.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("nw", "n1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("nw", "n2"), "w2")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi_tot))
        .select(
            "w1",
            "w2",
            F.col("n").cast("long").alias("n"),
            decimal_round(
                (F.col("n").cast("double") / F.col("_nb").cast("double"))
                / (
                    (F.col("n1").cast("double") / F.col("_nu").cast("double"))
                    * (F.col("n2").cast("double") / F.col("_nu").cast("double"))
                ),
                4,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "w1", "w2").limit(k_top)


def _lnq(x: Column, scale: int = 1_000_000) -> Column:
    """ln(x) quantized to BIGINT micro-units: FLOOR(ln(x)·1e6 + 0.5).
    At 1e6 the float ulp of ln(x)·1e6 (~1e-9 for x <= 1e6) is six
    orders below the .5 rounding boundary, so Spark's Math.log and
    DuckDB's libm log quantize identically even if they differ in the
    last ulp — which makes every SUM over these values an exact
    BIGINT, immune to float association order."""
    return F.floor(F.log(x.cast("double")) * scale + F.lit(0.5)).cast("long")


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy of each document's unigram distribution —
    the Gopher-style repetition/quality signal: low entropy = the doc
    is dominated by few tokens (boilerplate, keyword stuffing), high
    entropy ~ ln(n_distinct) = flat usage.  Returns (doc_id, n_tokens,
    n_distinct, h_scaled, entropy).

    Cross-engine exactness: H = (1/n)·Σ_t c_t·(ln n − ln c_t) is
    hostile to oracle comparison if summed in floats (association
    order).  Here each log is quantized to integer micro-nats
    (``_lnq``), so ``h_scaled = Σ c_t·(lnq(n) − lnq(c_t))`` is an
    exact BIGINT in BOTH engines and ``entropy`` is ONE IEEE division
    of identical integers — bit-identical, no rounding epsilon at all
    (quantization error ≤ 1e-6 nat/token is part of the DEFINITION,
    not a comparison tolerance).

    Scale shape: explode + two map-side-combinable groupBys (term
    counts, then per-doc fold) — scan-speed whole-stage codegen, no
    windows, no joins beyond the per-doc count recombine."""
    toks = docs.select(
        "doc_id",
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    # Σ c·(lnq n − lnq c) = n·lnq(n) − Σ c·lnq(c): fold the Σ exactly,
    # the n·lnq(n) term recombines after the same aggregate — one pass
    folded = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("c") * _lnq(F.col("c"))).alias("_clnc"),
    )
    h_scaled = (
        F.col("n_tokens") * _lnq(F.col("n_tokens")) - F.col("_clnc")
    ).cast("long")
    scored = folded.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_distinct",
        h_scaled.alias("h_scaled"),
        (
            h_scaled.cast("double")
            / (F.col("n_tokens") * 1_000_000).cast("double")
        ).alias("entropy"),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
            F.coalesce("h_scaled", F.lit(0)).cast("long").alias("h_scaled"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
    )


def heaps_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heaps-law fit V = K·n^beta over the corpus: log-log OLS of
    per-document (n_tokens, n_distinct) on the quantized-ln contract —
    one row ``(n_docs, beta, logk_unats)`` where ``beta`` is the
    vocabulary-growth exponent (English prose ~0.4-0.6; beta near 1 =
    no reuse, near-random tokens — a corpus-quality smell) and
    ``logk_unats`` the intercept in micro-nats.

    x = lnq(n_tokens), y = lnq(n_distinct) are BIGINT micro-nats, the
    five OLS moments are exact integer sums (one combinable
    aggregate), and beta / logK are two pinned float expressions.
    Overflow envelope: the per-moment sums are int64-safe to ~10⁹
    docs, and the CROSS-MULTIPLIED slope terms (sx·sy ≈
    (n·lnq)² ≈ 10²¹ already at 5·10³ docs — caught by the sf0.1 full
    gate, round 5) are widened to DECIMAL(20,0) products (oracle twin:
    HUGEINT): exact 128-bit integers in both engines, one double cast
    at the end.  Plan: the ``token_entropy`` explode + two groupBys,
    then a 1-row fold."""
    toks = docs.select(
        "doc_id",
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )
    per_doc = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .filter(F.col("n_tokens") >= 1)
    )
    pts = per_doc.select(
        _lnq(F.col("n_tokens")).alias("x"),
        _lnq(F.col("n_distinct")).alias("y"),
    )
    g = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # cross-multiplied moments overflow BIGINT past ~3000 docs
    # (sx·sy ≈ (n·ln(T)·10⁶)² ≈ 10²¹ at sf0.1 — caught by the sf0.1
    # full gate); widen to DECIMAL(20,0)·DECIMAL(20,0) — exact 128-bit
    # integer products in both engines (oracle twin: HUGEINT), cast to
    # double once at the end
    d20 = lambda c: F.col(c).cast("decimal(20,0)")  # noqa: E731
    num = (d20("n") * d20("sxy") - d20("sx") * d20("sy")).cast("double")
    den = (d20("n") * d20("sxx") - d20("sx") * d20("sx")).cast("double")
    beta = F.when(den != 0, num / den).otherwise(F.lit(0.0))
    logk = (
        F.col("sy").cast("double") - beta * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    from crgp_spark.functions import decimal_round

    return g.select(
        F.col("n").alias("n_docs"),
        decimal_round(beta, 6).alias("beta"),
        decimal_round(logk, 2).alias("logk_unats"),
    )
