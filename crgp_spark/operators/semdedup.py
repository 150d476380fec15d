"""Semantic deduplication over an embedding column (SemDeDup-style).

The LLM-curation step between lexical near-dup (MinHash/SimHash on
text, `dedup.py`) and mixture sampling: drop documents whose EMBEDDING
is almost identical to another's, even when the surface text differs
(translations, templated rewrites, boilerplate paraphrases).  The
public recipe (Abbas et al. 2023, "SemDeDup", arXiv:2303.09540) is
k-means partitioning of the embedding space followed by within-cluster
cosine pruning — pairwise similarity is only ever computed INSIDE a
cluster, never across the corpus.

Spark-first plan, in three scan-shaped stages:

1. ASSIGN — the `kmeans.py` step: quantize vectors once to integer
   ``scale``-units, broadcast the k centroids, one ``MIN(dist·k + j)``
   argmin per vector.  No shuffle of the vector table beyond the
   groupBy(vec_id) argmin.
2. PAIR — one self-join on ``cluster`` with ``a.id < b.id``: the only
   exchange in the plan, keyed on cluster.  Pair work is
   O(Σ n_c²) — at 100 TB you pick ``k ∝ N`` so the expected cluster
   size stays constant (SemDeDup uses k≈100k for 5B docs), and a hot
   cluster is exactly the AQE skew-join case.
3. PRUNE — a document is dropped iff SOME lower-id clustermate is
   within ``threshold`` cosine.  Keep-lowest-id is the deterministic
   stand-in for the paper's keep-one policy.

Cross-engine exactness (the family contract): cosine is never computed
as a float — ``cos(a,b) ≥ t  ⟺  dot > 0 ∧ dot²·10⁸ ≥ tnum²·(aa·bb)``
with ``t = tnum/10⁴`` and dot/aa/bb BIGINT sums over the quantized
ints, cross-multiplied in DECIMAL(38,0) (HUGEINT on the DuckDB side).
No sqrt, no division, no libm — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quantize(df: DataFrame, id_col: str, vec_col: str, scale: int) -> DataFrame:
    return df.select(
        id_col,
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
        ).alias("qv"),
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.92,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: k-means-partitioned within-cluster cosine pruning.

    Returns ``(vec_id, cluster, keep)`` — ``keep = false`` iff a
    lower-id vector in the same cluster has cosine ≥ ``threshold``.
    ``threshold`` must have at most 4 decimal places (it is compared in
    exact 1e-4 units)."""
    tnum = int(round(threshold * 10_000))
    if not 0 < tnum <= 10_000:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    q = _quantize(embeddings, id_col, vec_col, scale)
    # deterministic seed centroids: the k lowest-id vectors (callers
    # doing real clustering feed kmeans_fit centroids instead)
    cents = (
        q.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1)
            .cast("int")
            .alias("j"),
            F.col("qv").alias("qc"),
        )
    )
    dist = F.aggregate(
        F.zip_with("qv", "qc", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    assign = (
        q.crossJoin(F.broadcast(cents))
        .select(id_col, (dist * k + F.col("j")).alias("comp"))
        .groupBy(id_col)
        .agg((F.min("comp") % k).cast("int").alias("cluster"))
    )
    qa = q.join(assign, id_col).select(
        F.col(id_col).alias("id"),
        "cluster",
        "qv",
        F.aggregate(
            F.zip_with("qv", "qv", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("ss"),
    )
    lo = qa.select(
        F.col("id").alias("a_id"),
        F.col("cluster"),
        F.col("qv").alias("a_qv"),
        F.col("ss").alias("aa"),
    )
    hi = qa.select(
        F.col("id").alias("b_id"),
        F.col("cluster"),
        F.col("qv").alias("b_qv"),
        F.col("ss").alias("bb"),
    )
    dot = F.aggregate(
        F.zip_with("a_qv", "b_qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dec = "decimal(38,0)"
    dropped = (
        lo.join(hi, "cluster")
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            (dot > 0)
            & (
                dot.cast(dec) * dot.cast(dec) * F.lit(100_000_000).cast(dec)
                >= F.lit(tnum * tnum).cast(dec)
                * F.col("aa").cast(dec)
                * F.col("bb").cast(dec)
            )
        )
        .select(F.col("b_id").alias("id"))
        .distinct()
    )
    return (
        qa.join(dropped.withColumn("dup", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("keep"),
        )
    )
