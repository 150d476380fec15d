"""Deterministic distributed k-means step (Lloyd iteration).

Embedding-table clustering is the other half of the similarity family
(knn answers "who is near X", k-means answers "what groups exist") and
the workhorse behind IVF index construction — `similarity.knn_ivf`'s
centroid table is exactly what repeated application of this step
produces.  One step = ASSIGN (each vector to its nearest centroid) +
UPDATE (per-cluster dimension-wise mean).

Cross-engine exactness, the module family's contract: embeddings are
quantized once to integer ``scale``-units (float32 → double widening is
value-exact, then one floor), squared L2 distances are BIGINT sums,
the argmin is a single ``MIN`` over the composite ``dist·k + j`` (ties
to the lowest centroid index j), and centroid means are ONE
``floor(sum/count + 0.5)`` division per dimension.  No float
accumulation anywhere, so the DuckDB oracle matches bit-for-bit.

Seeding is deterministic: the k lowest-``vec_id`` vectors (callers
doing real clustering feed the previous step's output instead).

Scale shape at 100 TB: ASSIGN is a broadcast cross-join against k
centroid rows — O(N·k) work, no shuffle of the vector table; UPDATE is
a ``posexplode`` + map-side-combinable ``groupBy(cluster, dim)``.
This is the canonical Spark k-means plan (MLlib's own step has the
same two phases); the long-form integer output keeps the driver gate
free of float-array comparison hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kmeans_step(
    embeddings: DataFrame,
    k: int = 8,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration from the deterministic seed.  Returns the
    updated centroids in long form: ``(cluster, dim, c_unit,
    n_members)`` — ``c_unit`` is the per-dimension mean in integer
    ``scale``-units; clusters that attracted no vectors are absent."""
    q = embeddings.select(
        id_col,
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("qv"),
    )
    # the global row_number sees ONLY the k rows of the limit below —
    # never lift this idiom to a data-sized table (it would become a
    # full single-partition sort)
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
    ex = q.join(assign, id_col).select(
        "cluster", F.posexplode("qv").alias("dim", "u")
    )
    return ex.groupBy("cluster", "dim").agg(
        F.floor(F.sum("u").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("c_unit"),
        F.count(F.lit(1)).alias("n_members"),
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 5,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Iterate Lloyd steps from the deterministic seed: each round's
    centroid table (still in integer units — re-quantization between
    rounds is inherent, which is what keeps every round cross-engine
    reproducible) feeds the next assignment.  Returns the final
    ``(cluster, dim, c_unit, n_members)`` table.

    The per-round plan is the `kmeans_step` shape; the centroid table
    (k·dim rows) is collected into the next round's broadcast — the
    k-means driver loop every distributed implementation uses (MLlib
    included), with O(k·dim) driver state only."""
    q = embeddings.select(
        id_col,
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("qv"),
    ).persist()
    spark = embeddings.sparkSession
    # the global row_number sees ONLY the k rows of the limit below —
    # never lift this idiom to a data-sized table (it would become a
    # full single-partition sort)
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
    out = None
    for _ in range(iterations):
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
        out = (
            q.join(assign, id_col)
            .select("cluster", F.posexplode("qv").alias("dim", "u"))
            .groupBy("cluster", "dim")
            .agg(
                F.floor(
                    F.sum("u").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
                )
                .cast("long")
                .alias("c_unit"),
                F.count(F.lit(1)).alias("n_members"),
            )
        )
        rows = out.collect()  # O(k·dim) driver state, the k-means loop
        dims = max(r["dim"] for r in rows) + 1
        arr: dict[int, list[int]] = {}
        for r in rows:
            arr.setdefault(r["cluster"], [0] * dims)[r["dim"]] = r["c_unit"]
        cents = F.broadcast(
            spark.createDataFrame(
                [(j, arr[j]) for j in sorted(arr)], "j int, qc array<long>"
            )
        )
    q.unpersist()
    # hand back the already-materialized final table (q is unpersisted;
    # the lazy plan would recompute the whole history)
    return spark.createDataFrame(
        [(r["cluster"], r["dim"], r["c_unit"], r["n_members"]) for r in rows],
        "cluster int, dim int, c_unit long, n_members long",
    )
