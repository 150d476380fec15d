"""k-center diversity selection (Gonzalez farthest-point) over an
embedding table — coreset picking for training-data curation.

Greedy 2-approximation of the k-center objective (Gonzalez 1985):
start from a deterministic seed (min id), then k-1 times pick the
point FARTHEST from every already-chosen center.  The selected set
maximizes coverage diversity — the standard "pick maximally spread
exemplars" step of embedding-driven data curation (the same role
`semdedup` plays for redundancy REMOVAL, this plays for diversity
KEEPING; the reference has no embedding ops at all).

All distances are EXACT int64: components quantized to
``floor(x·10^6 + 0.5)`` (``similarity.LSH_QUANT`` discipline) and the
squared euclidean folded with ``zip_with`` — |d²| ≤ 64·(2.1e6)² ≈
2.8e14 < 2^63/8 — so argmax/argmin decisions, and therefore the whole
selection, are bit-identical across engines and summation orders.

Scale shape: each of the k rounds is one SCAN + a broadcast literal
(the newest center's 64 ints) folded into a running per-point min —
no shuffle at all inside a round (the argmax is TakeOrderedAndProject,
O(partitions) driver merge); the final assignment is one broadcast
k-row cross join.  Driver state is O(k·dim) integers (the k-means
precedent).  The per-point best-distance column chains k ``LEAST``
expressions — fine for coreset-sized k; a k in the thousands would
checkpoint every ~16 rounds like the iterative operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.operators.similarity import LSH_QUANT


def _quant(vec: Column) -> Column:
    return F.transform(
        vec,
        lambda x: F.floor(
            x.cast("double") * F.lit(float(LSH_QUANT)) + F.lit(0.5)
        ).cast("long"),
    )


def _d2_lit(q: Column, center: list[int]) -> Column:
    """Exact squared euclidean between a quantized vector column and a
    center given as Python ints (broadcast as a literal array)."""
    c = F.array(*[F.lit(int(v)).cast("long") for v in center])
    return F.aggregate(
        F.zip_with(q, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kcenter_assign(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pick ``k`` Gonzalez centers and assign every point to its
    nearest one: ``(vec_id, center_rank, center_id, d2)``.  Ties on
    distance break toward the EARLIER-selected center, argmax ties
    toward the smaller id — both engine-stable because every key is an
    exact integer."""
    if k < 1 or k > 1_000:
        raise ValueError("k must be in [1, 1000] (driver holds k·dim ints)")
    pts = emb.select(
        F.col(id_col).alias("vid"), _quant(F.col(vec_col)).alias("q")
    )
    if pts.limit(k).count() < k:
        raise ValueError(f"k={k} exceeds the number of points")
    seed = pts.orderBy("vid").limit(1).collect()[0]
    centers: list[tuple[int, int, list[int]]] = [(0, seed["vid"], seed["q"])]
    state = pts.withColumn("best", _d2_lit(F.col("q"), seed["q"]))
    for r in range(1, k):
        top = state.orderBy(F.desc("best"), "vid").limit(1).collect()[0]
        centers.append((r, top["vid"], top["q"]))
        state = state.withColumn(
            "best",
            F.least(F.col("best"), _d2_lit(F.col("q"), top["q"])),
        )
    cent = spark.createDataFrame(
        [(r, cid, qv) for r, cid, qv in centers],
        "rk int, cid long, cq array<long>",
    )
    pair = pts.crossJoin(F.broadcast(cent)).select(
        "vid",
        "rk",
        "cid",
        F.aggregate(
            F.zip_with(
                F.col("q"), F.col("cq"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    # pack (d2, rank) into ONE exact integer key: min = nearest center,
    # earliest-selected on ties — a plain hash agg, no SortAggregate
    key = F.col("d2") * k + F.col("rk")
    best = pair.groupBy("vid").agg(F.min(key).alias("key"))
    return best.join(
        F.broadcast(cent.select("rk", "cid")),
        (F.col("key") % k).cast("int") == F.col("rk"),
    ).select(
        F.col("vid").alias("vec_id"),
        F.col("rk").alias("center_rank"),
        F.col("cid").alias("center_id"),
        F.expr(f"key div {k}").cast("long").alias("d2"),
    )
