"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard — all expressed as declarative
DataFrame pipelines so Catalyst handles pushdown/combine, and all built
ONLY from constructs with exact ANSI-SQL twins (``md5``, string min,
array ops) so every variant is verifiable against the DuckDB oracle.

Scale design notes (100 TB):
- exact/fingerprint dedup: one map-side-combinable groupBy on a 128-bit
  digest — the canonical first pass.
- MinHash/LSH: signatures are per-row (embarrassingly parallel); the
  only shuffle is the band-bucket self-join, whose fan-out is bounded by
  bucket size; hot buckets are exactly the AQE skew-join case.
- pairwise verification joins re-shuffle only LSH candidates, never the
  full corpus.
- MinHash here uses the *lexicographic minimum of md5 hex digests* as
  the hash family (one salt per hash index). md5 is uniform, so min-hex
  is a valid minwise sketch, and — unlike integer hash mixing — it is
  bit-identical in every SQL engine, which makes the oracle exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round
from crgp_spark.operators.textstats import normalize_text, tokens


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams of the normalized text (array<string>);
    shorter-than-k docs yield their whole text as one shingle."""
    toks = tokens(normalize_text(text))
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.array_distinct(
        F.when(n == 0, F.array().cast("array<string>")).otherwise(grams)
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content digest: one surviving (minimum)
    doc_id per distinct text. Returns (keep_id, n_dupes)."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
        .select("keep_id", "n_dupes")
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n_hashes: int = 12, k: int = 3
) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}): MinHash signature — per hash index i,
    the minimum md5 hex digest of ``shingle || '#i'``."""
    sh = docs.select("doc_id", F.explode(word_shingles(F.col(text_col), k)).alias("s"))
    aggs = [
        F.min(F.md5(F.concat(F.col("s"), F.lit(f"#{i}")))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 12,
    band_size: int = 2,
    k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) sharing at least one LSH
    band (bands = consecutive groups of ``band_size`` signature slots)."""
    sigs = minhash_signatures(docs, text_col, n_hashes, k)
    n_bands = n_hashes // band_size
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"sig_{b * band_size + j}")
                                for j in range(band_size)
                            ],
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    l = bands.select(F.col("doc_id").alias("a"), "band", "key")
    r = bands.select(F.col("doc_id").alias("b"), "band", "key")
    return (
        l.join(r, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame | None = None,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (all pairs
    sharing >=1 shingle when ``candidates`` is None). Returns
    (a, b, inter, uni) with inter/uni integer shingle counts and
    inter > threshold*uni — integer-only output so oracle comparison is
    exact."""
    sh = docs.select(
        F.col("doc_id"), word_shingles(F.col(text_col), k).alias("sh")
    )
    if candidates is None:
        ex = sh.select("doc_id", F.explode("sh").alias("s"))
        candidates = (
            ex.alias("l")
            .join(ex.alias("r"), "s")
            .filter(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(
                F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
            )
            .distinct()
        )
    a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    out = (
        candidates.join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            F.size(F.array_union("sh_a", "sh_b")).alias("uni"),
        )
        .filter(F.col("inter") > F.lit(threshold) * F.col("uni"))
    )
    return out.select("a", "b", "inter", "uni")


def minhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 12,
    band_size: int = 2,
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """MinHash+LSH near-duplicate removal: LSH candidates -> exact
    Jaccard verification -> drop the larger doc_id of every verified
    pair. Returns surviving (doc_id)."""
    cands = lsh_candidate_pairs(docs, text_col, n_hashes, band_size, k)
    verified = jaccard_pairs(docs, cands, text_col, k, threshold)
    losers = verified.select(F.col("b").alias("doc_id")).distinct()
    return docs.select("doc_id").join(losers, "doc_id", "left_anti")


def neardup_clusters(
    spark,
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 12,
    band_size: int = 2,
    k: int = 3,
    threshold: float = 0.6,
    cfg=None,
) -> DataFrame:
    """Near-duplicate CLUSTERING: LSH candidates -> exact-Jaccard
    verified pairs -> connected components over the pair graph ->
    one row per document with its cluster representative (min doc_id
    reachable through verified near-dup pairs) and the cluster size.

    ``minhash_dedup`` drops the larger side of each PAIR, which keeps a
    doc whose only near-dups were themselves dropped; clustering gives
    the transitive answer (one canonical doc per dup *family*) — the
    policy large-corpus pipelines actually want.  Every stage is a
    bucketed join or the small-/large-star component rounds, so the
    composition inherits both families' 100 TB properties.
    """
    from crgp_spark.operators.components import connected_components

    cands = lsh_candidate_pairs(docs, text_col, n_hashes, band_size, k)
    verified = jaccard_pairs(docs, cands, text_col, k, threshold)
    edges = verified.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ids = docs.select("doc_id")
    if edges.isEmpty():
        lab = ids.select("doc_id", F.col("doc_id").alias("cluster"))
    else:
        comps = connected_components(
            spark, edges, cfg, algo_name="neardup_cc"
        )
        lab = ids.join(
            comps, ids["doc_id"] == comps["vid"], "left"
        ).select(
            "doc_id", F.coalesce("component", "doc_id").alias("cluster")
        )
    sizes = lab.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return lab.join(sizes, "cluster").select(
        "doc_id", "cluster", "cluster_size"
    )


def simhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_bits: int = 32,
    k: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Hamming-LSH candidate pairs: documents whose SimHashes agree on
    at least one of ``n_bands`` contiguous bit bands (the bit-sampling
    LSH family — two docs within Hamming distance d collide with
    probability >= 1 - (1 - (1 - d/n)^(n/b))^b). A banded bucket
    self-join, NOT all-pairs: scale-safe like the MinHash LSH path;
    near-constant bands (e.g. all-zeros from short docs) are the hot
    buckets AQE's skew-join handles. Returns distinct (a, b), a < b."""
    sig = simhash(docs, text_col, n_bits, k)
    band_len = n_bits // n_bands
    bands = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        "simhash",
    ).select(
        "doc_id",
        "band",
        F.expr(f"substring(simhash, band * {band_len} + 1, {band_len})").alias(
            "key"
        ),
    )
    a = bands.select(
        "band", "key", F.col("doc_id").alias("a")
    )
    b = bands.select(
        "band", "key", F.col("doc_id").alias("b")
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_bits: int = 32,
    k: int = 3,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Verified SimHash near-duplicates: banded candidates whose full
    signatures are within ``max_hamming`` bits. The Hamming distance is
    computed on the LSH candidates only (joins back the two signature
    strings; per-char compare via zip_with — pure JVM codegen).
    Returns (a, b, hamming)."""
    sig = simhash(docs, text_col, n_bits, k)
    cands = simhash_candidate_pairs(docs, text_col, n_bits, k, n_bands)
    withsig = cands.join(
        sig.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa")),
        "a",
    ).join(
        sig.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb")),
        "b",
    )
    chars = lambda c: F.split(F.col(c), "(?!^)")  # noqa: E731
    ham = F.aggregate(
        F.zip_with(chars("sa"), chars("sb"), lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")
    return (
        withsig.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def simhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    n_bits: int = 32,
    k: int = 3,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate removal: banded candidates -> Hamming
    verification -> drop the larger doc_id of each verified pair.
    Returns surviving (doc_id). The Hamming-LSH counterpart of
    ``minhash_dedup`` (same bucket-join/verify/anti-join shape, same
    100 TB story)."""
    verified = simhash_pairs(docs, text_col, n_bits, k, n_bands, max_hamming)
    losers = verified.select(F.col("b").alias("doc_id")).distinct()
    return docs.select("doc_id").join(losers, "doc_id", "left_anti")


def simhash(
    docs: DataFrame, text_col: str = "text", n_bits: int = 32, k: int = 3
) -> DataFrame:
    """(doc_id, simhash): n_bit SimHash as a bit string. Bit j of a
    shingle comes from the j-th bit of its md5 hex digest (4 bits per
    hex digit via ``instr``-based digit decoding — exact in SQL too);
    document bit j = majority vote across shingles."""
    sh = docs.select("doc_id", F.explode(word_shingles(F.col(text_col), k)).alias("s"))
    sh = sh.select("doc_id", F.md5("s").alias("h"))
    # hex digit j/4 of the digest, bit (3 - j%4) of that digit — written
    # as floor/pow/mod integer arithmetic that is bit-identical in the
    # DuckDB oracle (no engine-specific shift operators).
    hexval = (
        F.expr("instr('0123456789abcdef', substring(h, cast(j / 4 as int) + 1, 1))")
        - 1
    )
    bit = F.pmod(
        F.floor(
            hexval.cast("double")
            / F.pow(F.lit(2.0), (3 - F.pmod(F.col("j"), F.lit(4))).cast("double"))
        ).cast("int"),
        F.lit(2),
    )
    bits = sh.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("j"),
    ).select("doc_id", "j", bit.alias("bit"))
    votes = bits.groupBy("doc_id", "j").agg(
        (F.sum(F.col("bit") * 2 - 1)).alias("v")
    )
    out = votes.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("j", (F.col("v") > 0).cast("int").alias("b")))
                ),
                lambda x: x["b"].cast("string"),
            ),
        ).alias("simhash")
    )
    return out


def setsim_join(
    docs: DataFrame,
    threshold: tuple[int, int] = (9, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int | None = None,
) -> DataFrame:
    """EXACT Jaccard set-similarity self-join with AllPairs prefix
    filtering (Bayardo et al. 2007) — the exact counterpart of the
    MinHash/LSH family above: LSH trades recall for speed, this trades
    nothing and still avoids the all-pairs comparison.

    Tokens are globally ordered rarest-first (document frequency asc,
    token asc — a deterministic total order); a document's PREFIX is
    its first ``|s| - ceil(t*|s|) + 1`` tokens.  The AllPairs lemma:
    two sets with Jaccard >= t always share a prefix token, so blocking
    on prefix tokens is complete, and rare-token prefixes keep the
    candidate fan-out small.  Threshold is the rational ``num/den`` so
    every filter is an integer cross-multiplication — no floats
    anywhere except the final reported 4dp Jaccard.

    Returns ``(doc1, doc2, inter, uni, jaccard)`` for every unordered
    pair with ``inter/uni >= num/den``.

    Scale shape at 100 TB: one distinct-token explode, one
    vocabulary-keyed join for document frequencies, one PARTITIONED
    rank window per document, a self-join restricted to prefix tokens
    (by construction the rare ones), and a candidate-bounded
    verification join — the canonical production set-similarity plan.

    CAVEAT — prefix filtering prunes in proportion to token RARITY: a
    corpus whose documents draw from a tiny vocabulary (every token
    frequent) degenerates toward the all-pairs candidate set.  Pass
    ``shingle_k`` to build the sets from word ``k``-gram shingles
    instead of unigrams — shingle spaces are combinatorially sparse,
    which restores the pruning (and is how production near-dup
    pipelines run AllPairs).
    """
    num, den = threshold
    if not 0 < num <= den:
        raise ValueError("threshold must be a rational in (0, 1]")
    elems = (
        word_shingles(F.col(text_col), shingle_k)
        if shingle_k
        else F.array_distinct(tokens(normalize_text(F.col(text_col))))
    )
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(elems).alias("w"),
    )
    dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    sz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    pos_w = Window.partitionBy("doc_id").orderBy("c", "w")
    ordered = (
        tok.join(dfreq, "w")
        .withColumn("pos", F.row_number().over(pos_w))
        .join(sz, "doc_id")
    )
    # prefix length = n - ceil(num*n/den) + 1, all-integer
    p = F.col("n") - F.floor((num * F.col("n") + den - 1) / F.lit(den)) + 1
    pref = ordered.filter(F.col("pos") <= p).select("doc_id", "w")
    cand = (
        pref.select(F.col("doc_id").alias("doc1"), "w")
        .join(pref.select(F.col("doc_id").alias("doc2"), "w"), "w")
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )
    inter = (
        cand.join(tok.select(F.col("doc_id").alias("doc1"), "w"), "doc1")
        .join(tok.select(F.col("doc_id").alias("doc2"), "w"), ["doc2", "w"])
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sz.select(F.col("doc_id").alias("doc1"), F.col("n").alias("_na")), "doc1")
        .join(sz.select(F.col("doc_id").alias("doc2"), F.col("n").alias("_nb")), "doc2")
        .withColumn("uni", F.col("_na") + F.col("_nb") - F.col("inter"))
        .filter(F.col("inter") * den >= num * F.col("uni"))
        .select(
            "doc1",
            "doc2",
            F.col("inter").cast("long").alias("inter"),
            F.col("uni").cast("long").alias("uni"),
            decimal_round(
                F.col("inter").cast("double") / F.col("uni").cast("double"), 4
            ).alias("jaccard"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    gram_len: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): flag
    every maximal token span covered by ``gram_len``-grams that occur
    at least ``min_count`` times CORPUS-WIDE (within-document repeats
    count), the span-level complement of the document-level
    MinHash/SimHash family — the unit removed is the repeated
    boilerplate passage, not the whole document.

    Spark-first plan (the suffix-array build the paper uses is a
    single-machine construction; the equivalent corpus-wide repeated
    n-gram query distributes as):

    1. one projection computing all overlapping gram md5s per doc
       (``transform`` over a 0..n-gram_len sequence + ``slice`` —
       O(n·gram_len) per doc, NOT the nested-transform quadratic trap
       the winnow fix documents) + ``posexplode``;
    2. ONE map-side-combinable ``groupBy(hash)`` count — the only
       corpus-wide exchange, same shape at 100 TB;
    3. a semi-join of gram positions against the >=min_count hashes
       (AQE picks broadcast when the duplicated-gram set is small —
       the common case — and shuffles otherwise);
    4. per-document interval merge of the flagged fixed-length grams:
       island = running count of gaps (pos > running max end), one
       window partitioned by doc_id — state bounded by document
       length, never corpus size.

    Returns ``(doc_id, span_start, span_end, n_grams)`` with
    [span_start, span_end) in 0-based token indices over the
    NORMALIZED tokenization (`textstats.normalize_text` + whitespace
    tokens, the family's shared key) and n_grams = flagged grams
    merged into the span. Adjacent flagged grams merge: every token
    in a reported span is covered by some duplicated gram.
    """
    if gram_len < 1:
        raise ValueError(f"need gram_len >= 1, got {gram_len}")
    if min_count < 2:
        raise ValueError(f"need min_count >= 2, got {min_count}")
    toks = tokens(normalize_text(F.col(text_col)))
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - gram_len),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, gram_len))),
    )
    g = docs.select(
        F.col("doc_id"),
        F.posexplode(
            F.when(n >= gram_len, grams).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("pos", "h"),
    )
    dup = (
        g.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("h")
    )
    flagged = g.join(dup, "h", "left_semi").select("doc_id", "pos")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + gram_len).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        F.col("pos") > F.coalesce(prev_end, F.lit(-1)), F.lit(1)
    ).otherwise(F.lit(0))
    islands = flagged.withColumn(
        "island",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + gram_len).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )


def hard_negatives(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 12,
    band_size: int = 2,
    k: int = 3,
    lo: tuple[int, int] = (1, 10),
    hi: tuple[int, int] = (6, 10),
    per_anchor: int = 5,
) -> DataFrame:
    """Contrastive hard-negative mining — the training-pair step
    between dedup and packing: for each anchor document, up to
    ``per_anchor`` documents that are SIMILAR BUT NOT DUPLICATES,
    i.e. exact shingle-Jaccard in ``[lo, hi)`` (rational bounds,
    compared cross-multiplied in integers — never a float threshold).
    Easy negatives are useless and near-duplicates are false
    negatives; this band is where contrastive gradients live
    (SimCSE/DPR practice).

    Candidates come from the MinHash-LSH band join (bounded buckets,
    never all-pairs — the ``minhash_dedup`` scale posture), verified
    with exact integer (inter, uni) shingle counts; both orientations
    of each surviving pair are anchored and ranked by the
    deterministic (sim desc, neg asc) order, where ``sim`` is the one
    IEEE division inter/uni (identical operands ⇒ identical double in
    both engines). Returns ``(anchor, neg, inter, uni, sim)``.

    The LSH recall caveat is inherited and measured elsewhere
    (``lsh_recall`` entry): pairs below the band-collision curve are
    missed by design — acceptable for negatives, which only need to
    be plentiful and hard, not exhaustive."""
    lo_n, lo_d = lo
    hi_n, hi_d = hi
    cand = lsh_candidate_pairs(docs, text_col, n_hashes, band_size, k)
    sh = docs.select(
        F.col("doc_id"), word_shingles(F.col(text_col), k).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    pairs = (
        cand.join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            F.size(F.array_union("sh_a", "sh_b")).alias("uni"),
        )
        .filter(
            (F.col("inter") * lo_d >= F.lit(lo_n) * F.col("uni"))
            & (F.col("inter") * hi_d < F.lit(hi_n) * F.col("uni"))
        )
    )
    both = pairs.select(
        F.col("a").alias("anchor"),
        F.col("b").alias("neg"),
        "inter",
        "uni",
    ).unionByName(
        pairs.select(
            F.col("b").alias("anchor"),
            F.col("a").alias("neg"),
            "inter",
            "uni",
        )
    )
    sim = F.col("inter").cast("double") / F.col("uni").cast("double")
    from pyspark.sql import Window

    w = Window.partitionBy("anchor").orderBy(
        F.desc("sim"), F.asc("neg")
    )
    return (
        both.withColumn("sim", sim)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_anchor)
        .select("anchor", "neg", "inter", "uni", "sim")
    )
