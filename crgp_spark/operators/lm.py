"""Statistical language-model scoring for training-data curation —
the model-based quality/selection layer of an LLM data pipeline
(first-class per the task brief; the reference has no text scoring —
its per-record state is the retweet-seen flag, ``leaf.rs:53-66`` —
these sit beside ``textstats.py``/``curation.py`` as the corpus-level
statistical models a 100 TB curation run needs).

Three published, industry-standard selectors, each expressed so the
scores are EXACT cross-engine integers:

- ``ngram_lm`` / ``lm_score`` — add-k-smoothed bigram LM; per-doc
  negative log-likelihood is the classic fluency / quality filter
  (CCNet-style: keep documents a corpus LM finds unsurprising).
- ``nb_train`` / ``nb_classify`` — multinomial naive Bayes over
  unigrams; the fastText-style supervised classifier used for both
  language ID and quality ("looks like Wikipedia") gates.
- ``dsir_weights`` — Data Selection with Importance Resampling
  (Xie et al., NeurIPS 2023): hashed-bigram log-likelihood ratio
  between a target domain and the raw pool.

Exactness contract (same device as ``textstats.token_entropy``): every
probability is a ratio of BIGINT counts, every log goes through
``_lnq`` (ln quantized to micro-nats, FLOOR(ln(x)*1e6 + 0.5) — the
float ulp of ln is six orders below the rounding boundary, so Spark's
``Math.log`` and DuckDB's libm quantize identically), and sums of
quantized logs are exact BIGINTs in both engines. The only IEEE float
op in any output is ONE final division (correctly rounded by the
standard, so bit-identical), never ``exp``/``pow`` (not
correctly-rounded-guaranteed across libm implementations).

100 TB shape: everything is explode + map-side-combinable groupBys +
key-partitioned equi-joins on token/bucket keys. The DSIR feature
table is exactly ``n_buckets`` rows regardless of corpus size —
a broadcast join at any scale. The bigram LM table scales with the
corpus but joins shuffle-hash on (w1, w2) with AQE handling hot
function words; no windows, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crgp_spark.operators.textstats import _lnq, normalize_text, tokens

__all__ = ["ngram_lm", "lm_score", "nb_train", "nb_classify", "dsir_weights"]


def _bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per consecutive token pair; docs with
    fewer than two tokens contribute no rows."""
    tk = docs.select(
        "doc_id", tokens(normalize_text(F.col(text_col))).alias("tk")
    ).where(F.size("tk") >= 2)
    return tk.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("tk"), i).alias("w1"),
                    F.element_at(F.col("tk"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")


def ngram_lm(docs: DataFrame, text_col: str = "text") -> dict[str, DataFrame]:
    """Train an add-1 bigram model. Returns the three model tables:

    - ``bigram``: (w1, w2, c) BIGINT pair counts,
    - ``context``: (w1, ctx) BIGINT first-position counts,
    - ``vocab``: 1 row (v) — distinct unigram vocabulary size
      (the add-1 denominator breadth).

    Two map-side-combinable groupBys over the exploded pairs plus one
    distinct-count; all counts exact BIGINTs.
    """
    uni = docs.select(
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("t")
    )
    vocab = uni.agg(F.count_distinct("t").alias("v"))
    bg = _bigrams(docs, text_col)
    bigram = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    context = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("ctx"))
    return {"bigram": bigram, "context": context, "vocab": vocab}


def lm_score(
    docs: DataFrame, model: dict[str, DataFrame], text_col: str = "text"
) -> DataFrame:
    """Per-document add-1 bigram negative log-likelihood:

    ``p(w2|w1) = (c + 1) / (ctx + V)`` — unseen pair in a seen context
    falls back to ``1/(ctx+V)``; a wholly unseen context to ``1/V``
    (c = ctx = 0 under the same formula, no special case).

    Output (doc_id, n_bigrams, nll_scaled, avg_nll): ``nll_scaled =
    Σ m·(lnq(ctx+V) − lnq(c+1))`` is an exact BIGINT micro-nat total in
    both engines; ``avg_nll`` (nats/bigram) is ONE IEEE division.
    Docs with < 2 tokens score (0, 0, 0.0).

    Plan: per-doc pair counts (map-side combine) → left join the model
    on (w1, w2) and on w1 → one fold. Both joins are shuffle-hash on
    token keys; the V scalar rides in as a broadcast 1-row cross-join.
    """
    pair_m = (
        _bigrams(docs, text_col)
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    joined = (
        pair_m.join(model["bigram"], ["w1", "w2"], "left")
        .join(model["context"], ["w1"], "left")
        .crossJoin(F.broadcast(model["vocab"]))
        .select(
            "doc_id",
            "m",
            (
                _lnq(F.coalesce(F.col("ctx"), F.lit(0)) + F.col("v"))
                - _lnq(F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
            ).alias("nllq"),
        )
    )
    folded = joined.groupBy("doc_id").agg(
        F.sum("m").alias("n_bigrams"),
        F.sum(F.col("m") * F.col("nllq")).alias("nll_scaled"),
    )
    return (
        docs.select("doc_id")
        .join(folded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_scaled", F.lit(0)).cast("long").alias("nll_scaled"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("nll_scaled").cast("double")
                / (F.col("n_bigrams") * 1_000_000).cast("double")
            )
            .alias("avg_nll"),
        )
    )


def nb_train(
    docs: DataFrame, label_col: str = "lang", text_col: str = "text"
) -> dict[str, DataFrame]:
    """Multinomial naive-Bayes with add-1 smoothing. Model tables:

    - ``term``: (label, t, c) per-class unigram counts,
    - ``cls``: (label, n_tokens, n_docs) per-class totals,
    - ``total``: 1 row (v, d) — global vocab size + doc count.
    """
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("t"),
    )
    term = toks.groupBy("label", "t").agg(F.count(F.lit(1)).alias("c"))
    cls = term.groupBy("label").agg(F.sum("c").alias("n_tokens")).join(
        docs.groupBy(F.col(label_col).alias("label")).agg(
            F.count(F.lit(1)).alias("n_docs")
        ),
        "label",
        "right",  # a class whose docs are all empty still has a prior
    ).select(
        "label",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "n_docs",
    )
    total = toks.agg(F.count_distinct("t").alias("v")).crossJoin(
        F.broadcast(docs.agg(F.count(F.lit(1)).alias("d")))
    )
    return {"term": term, "cls": cls, "total": total}


def nb_classify(
    docs: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    true_col: str | None = "lang",
) -> DataFrame:
    """Score every document against every class and pick the argmax:

    ``score_q(d, l) = lnq(n_docs_l) − lnq(D)
                    + Σ_t c_dt·lnq(c_tl + 1) − n_d·lnq(n_tokens_l + V)``

    — exact BIGINT micro-nats. Ties (possible only for degenerate
    docs) break to the lexicographically smallest label so the result
    is deterministic in both engines. Output
    (doc_id, pred, score_q[, truth, hit]).

    Plan: doc-term counts join the per-class term table on ``t``
    (inner — absent pairs contribute through the closed-form default
    term), fold per (doc, label), then a broadcast cross-join against
    the |classes|-row class table fills in every (doc, label) cell.
    One shuffle on the token key, everything else broadcast.
    """
    dt = docs.select(
        "doc_id",
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("t"),
    ).groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("m"))
    covered = (
        dt.join(model["term"], "t")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("m") * _lnq(F.col("c") + 1)).alias("cov"))
    )
    ndoc = docs.select("doc_id").join(
        dt.groupBy("doc_id").agg(F.sum("m").alias("n_d")), "doc_id", "left"
    ).select("doc_id", F.coalesce("n_d", F.lit(0)).alias("n_d"))
    cls = F.broadcast(
        model["cls"].crossJoin(F.broadcast(model["total"])).select(
            "label",
            (_lnq(F.col("n_docs")) - _lnq(F.col("d"))).alias("prior_q"),
            _lnq(F.col("n_tokens") + F.col("v")).alias("den_q"),
        )
    )
    cells = (
        ndoc.crossJoin(cls)
        .join(covered, ["doc_id", "label"], "left")
        .select(
            "doc_id",
            "label",
            (
                F.col("prior_q")
                + F.coalesce("cov", F.lit(0))
                - F.col("n_d") * F.col("den_q")
            ).alias("score_q"),
        )
    )
    best = cells.groupBy("doc_id").agg(F.max("score_q").alias("score_q"))
    pred = (
        cells.join(best, ["doc_id", "score_q"])
        .groupBy("doc_id", "score_q")
        .agg(F.min("label").alias("pred"))
    )
    if true_col is None:
        return pred.select("doc_id", "pred", "score_q")
    return pred.join(
        docs.select("doc_id", F.col(true_col).alias("truth")), "doc_id"
    ).select(
        "doc_id",
        "pred",
        "score_q",
        "truth",
        (F.col("pred") == F.col("truth")).cast("int").alias("hit"),
    )


def _bucket(col: Column, n_buckets: int) -> Column:
    """Deterministic cross-engine feature hash: first 8 hex digits of
    md5 as a uint32, mod ``n_buckets`` (same device as
    ``sample.py``/``similarity.py``)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def dsir_weights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hash each bigram into
    ``n_buckets`` buckets, fit add-1 multinomials over the bucket
    counts for the target slice (rows where ``target`` is true) and
    the full raw pool, and score every doc by the log-likelihood
    ratio::

        logw(d) = Σ_b c_db·(lnq(t_b+1) − lnq(r_b+1))
                  − n_d·(lnq(T+B) − lnq(R+B))

    Output (doc_id, n_feats, w_scaled, avg_w, selected): ``w_scaled``
    is the exact BIGINT micro-nat log-ratio, ``avg_w`` one IEEE
    division, ``selected`` the resample rule logw > 0 (doc looks more
    target-like than pool-like).

    Plan: the bucket-frequency table is exactly ``n_buckets`` rows —
    broadcast — so scoring is ONE scan over per-doc bucket counts with
    a broadcast join, the shape that holds at any corpus size.
    """
    bg = _bigrams(docs, text_col).join(
        docs.select("doc_id", target.alias("_tgt")), "doc_id"
    ).select(
        "doc_id",
        "_tgt",
        _bucket(F.concat_ws(" ", "w1", "w2"), n_buckets).alias("b"),
    )
    buckets = bg.groupBy("b").agg(
        F.count(F.lit(1)).alias("r_b"),
        F.sum(F.col("_tgt").cast("long")).alias("t_b"),
    )
    totals = buckets.agg(
        F.sum("r_b").alias("r_tot"), F.sum("t_b").alias("t_tot")
    )
    per_bucket = F.broadcast(
        buckets.select(
            "b", (_lnq(F.col("t_b") + 1) - _lnq(F.col("r_b") + 1)).alias("lrq")
        )
    )
    norm = F.broadcast(
        totals.select(
            (
                _lnq(F.col("t_tot") + n_buckets)
                - _lnq(F.col("r_tot") + n_buckets)
            ).alias("normq")
        )
    )
    db = bg.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("m"))
    folded = (
        db.join(per_bucket, "b")
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_feats"),
            F.sum(F.col("m") * F.col("lrq")).alias("num_q"),
        )
        .crossJoin(norm)
        .select(
            "doc_id",
            "n_feats",
            (F.col("num_q") - F.col("n_feats") * F.col("normq")).alias(
                "w_scaled"
            ),
        )
    )
    return (
        docs.select("doc_id")
        .join(folded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("w_scaled", F.lit(0)).cast("long").alias("w_scaled"),
            F.when(F.coalesce("n_feats", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("w_scaled").cast("double")
                / (F.col("n_feats") * 1_000_000).cast("double")
            )
            .alias("avg_w"),
            (F.coalesce("w_scaled", F.lit(0)) > 0).cast("int").alias(
                "selected"
            ),
        )
    )
