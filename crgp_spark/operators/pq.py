"""Product-quantization ANN (Jégou et al. 2011): codebook training,
encoding, and asymmetric-distance (ADC) top-k search.

PQ is the memory-bound half of the similarity family: `knn_ivf` prunes
WHICH vectors to score, PQ compresses HOW each vector is scored — a
64-dim float vector becomes ``m`` one-byte codes, and query-time
distance is ``m`` table lookups instead of 64 multiplies.  Real
deployments (FAISS IVF-PQ) stack both; here each half is its own
driver-gated operator.

Cross-engine exactness, the module family's contract: embeddings are
quantized once to integer ``scale``-units, per-subspace codebooks are
trained with ONE deterministic Lloyd step (seed = the ``n_codes``
lowest-``vec_id`` subvectors, exactly `kmeans.kmeans_step`'s recipe,
with the seed subvector standing in for a codeword that attracted no
vectors), all squared-L2 terms are BIGINT sums, and every argmin is a
``MIN`` over the composite ``dist·n_codes + code`` (ties to the lowest
code).  No float accumulation anywhere — the DuckDB oracle reproduces
codebooks, codes and ADC ranks bit-for-bit.

Scale shape at 100 TB:

* training touches only the seed rows plus one assign/update pass —
  broadcast cross-join against ``m·n_codes`` codewords, posexplode +
  map-side-combinable ``groupBy(sub, code, dim)``;
* encoding is a single scan-shaped pass (broadcast codebook, no
  shuffle of the corpus);
* the code table is ``m`` small ints per vector — the 100 TB corpus
  compresses ~256× before search ever runs;
* ADC search joins the code table against a broadcast per-query
  lookup table on ``(sub, code)`` — Q·m·n_codes rows, KB-scale —
  then one map-side-combinable ``groupBy(query, vector)`` SUM and a
  per-query top-k window (partitioned, never global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quantize(vec_col: str, scale: int):
    return F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
    )


def _subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, d_sub: int, scale: int
) -> DataFrame:
    """Long-form ``(id, sub, sv)``: the quantized vector split into
    ``m`` contiguous ``d_sub``-dim subvectors (pure array exprs)."""
    qv = _quantize(vec_col, scale)
    subs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("sub"),
                F.slice(qv, j * d_sub + 1, d_sub).alias("sv"),
            )
            for j in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(subs).alias("_s")).select(
        id_col, F.col("_s.sub").alias("sub"), F.col("_s.sv").alias("sv")
    )


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(subs: DataFrame, cb_arrays: DataFrame, n_codes: int) -> DataFrame:
    """Nearest codeword per (vector, subspace) — broadcast cross-join +
    composite-BIGINT argmin (ties to the lowest code)."""
    d = _sqdist(F.col("sv"), F.col("qc"))
    return (
        subs.join(F.broadcast(cb_arrays), "sub")
        .select(
            subs.columns[0],
            "sub",
            (d * n_codes + F.col("code")).alias("comp"),
        )
        .groupBy(subs.columns[0], "sub")
        .agg((F.min("comp") % n_codes).cast("int").alias("code"))
    )


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks with one deterministic Lloyd step.
    Returns the long form ``(sub, code, dim, c_unit)`` — ``dim`` is the
    offset WITHIN the subspace, ``c_unit`` the codeword component in
    integer ``scale``-units (the seed component where the codeword
    attracted no vectors, so the codebook is always complete)."""
    if dim % m != 0:
        raise ValueError(
            f"m={m} must divide dim={dim}: a non-divisor would silently "
            "drop the trailing dimensions from every distance"
        )
    d_sub = dim // m
    subs = _subvectors(embeddings, id_col, vec_col, m, d_sub, scale)

    # the global row_number sees ONLY the n_codes rows of the limit
    # above — never lift this idiom to a data-sized table (it would
    # become a full single-partition sort)
    seed_ids = (
        embeddings.select(id_col)
        .orderBy(id_col)
        .limit(n_codes)
        .select(
            F.col(id_col),
            (F.row_number().over(Window.orderBy(id_col)) - 1)
            .cast("int")
            .alias("code"),
        )
    )
    cents = subs.join(F.broadcast(seed_ids), id_col).select(
        "sub", "code", F.col("sv").alias("qc")
    )

    assign = _assign(subs, cents, n_codes)
    upd = (
        subs.join(assign, [id_col, "sub"])
        .select("sub", "code", F.posexplode("sv").alias("dim", "u"))
        .groupBy("sub", "code", "dim")
        .agg(
            F.floor(
                F.sum("u").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
            )
            .cast("long")
            .alias("upd_u")
        )
    )
    seed_long = cents.select(
        "sub", "code", F.posexplode("qc").alias("dim", "seed_u")
    )
    # the update table is bounded by m*n_codes*d_sub rows — broadcast
    return seed_long.join(F.broadcast(upd), ["sub", "code", "dim"], "left").select(
        "sub",
        "code",
        "dim",
        F.coalesce(F.col("upd_u"), F.col("seed_u")).alias("c_unit"),
    )


def _cb_arrays(codebooks: DataFrame) -> DataFrame:
    """(sub, code, qc array<long>) from the long form, dim-ordered."""
    return codebooks.groupBy("sub", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c_unit"))),
            lambda x: x["c_unit"],
        ).alias("qc")
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sub, code): each subvector's nearest codeword — the
    compressed representation, ``m`` codes per vector."""
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    subs = _subvectors(embeddings, id_col, vec_col, m, dim // m, scale)
    return _assign(subs, _cb_arrays(codebooks), n_codes)


def knn_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: ``(query_id, rank, neighbor_id, adc_dist)`` — exact
    queries against the PQ-compressed corpus; ``adc_dist`` is the
    BIGINT sum of per-subspace squared distances to the neighbor's
    codewords.  Rank ties break to the lowest neighbor id.  Pass a
    pre-trained ``codebooks`` table to reuse across query batches
    (the production shape — train once, encode once, search many)."""
    if codebooks is None:
        codebooks = pq_codebooks(
            corpus, m, n_codes, dim, scale, id_col, vec_col
        )
    d_sub = dim // m
    # materialize the tiny (m*n_codes rows) codebook ONCE: it feeds
    # both the corpus encode and the query LUT, and without this the
    # whole training lineage would execute twice
    cb = _cb_arrays(codebooks).localCheckpoint(eager=True)
    codes = _assign(
        _subvectors(corpus, id_col, vec_col, m, d_sub, scale), cb, n_codes
    )
    qsubs = _subvectors(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        "query_id",
        vec_col,
        m,
        d_sub,
        scale,
    )
    lut = qsubs.join(F.broadcast(cb), "sub").select(
        "query_id", "sub", "code", _sqdist(F.col("sv"), F.col("qc")).alias("d")
    )
    adc = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist"), F.col("neighbor_id")
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist")
    )
