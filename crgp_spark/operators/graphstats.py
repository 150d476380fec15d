"""Graph summary statistics over an edge table.

The reference's statistics operator (``statistics.rs:17-131``) reports
scalar load/derive counters; the structural companion its users compute
downstream is the degree distribution — the first thing anyone asks of
a new graph, and the input to skew decisions (hub thresholds, salting
factors — ``operators/pack.py`` / ``cascade.py`` pick their split
points from exactly these counts).

Scale shape: two map-side-combinable aggregations (per-vertex count,
then per-degree count) — the same plan at any scale; no windows, no
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Out-degree histogram ``(out_deg, n_vertices)`` over the vertex
    universe (src ∪ dst) — vertices with no out-edges land in the 0
    bucket via the left join, mirroring ``customer_order_distribution``'s
    outer-join-then-count shape on the warehouse side."""
    verts = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    deg = edges.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("_d")
    )
    return (
        verts.join(deg, "vid", "left")
        .select(F.coalesce("_d", F.lit(0)).alias("out_deg"))
        .groupBy("out_deg")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def clustering_coefficient(spark, edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over the undirected
    simple graph: ``coeff = 2·triangles / (degree·(degree−1))``
    (0 where degree < 2), with the distinct-neighbor degree.

    Composes the degree-oriented triangle counter with one
    distinct-neighbor aggregate — the standard cohesion metric next to
    the degree histogram.  The coefficient divides two exact integers,
    so the floor-rounded 6dp output is engine-independent.  Returns
    ``(vid, degree, triangles, coeff)``."""
    from crgp_spark.operators.triangles import triangles as _tri

    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbrs = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = nbrs.groupBy(F.col("a").alias("vid")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    _total, per_vertex = _tri(spark, edges)
    coeff = F.when(
        F.col("degree") >= 2,
        F.lit(2.0)
        * F.col("triangles").cast("double")
        / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return deg.join(per_vertex, "vid", "left").select(
        "vid",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        (F.floor(coeff * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("coeff"),
    )


def graph_summary(edges: DataFrame) -> DataFrame:
    """One-row structural summary of the undirected simple graph:
    ``(n_vertices, n_edges, max_deg, density, avg_deg, assortativity)``.

    Degree assortativity (Newman 2002) is computed from INTEGER moments
    over the directed orientation list — M, Σx, Σx², Σxy are exact
    BIGINT sums (map-side combinable), and the only float ops are the
    two final divisions, so the result is bit-identical in any engine
    and independent of partitioning/summation order.  At 100 TB the
    same plan holds; the BIGINT moments overflow only past ~3·10^9
    edge-endpoints × 10^4-degree hubs — switch the two product sums to
    DECIMAL(38,0) there, same shape.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    both = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("u").alias("_su"), F.col("d").alias("dx"))
    dv = deg.select(F.col("u").alias("_sv"), F.col("d").alias("dy"))
    pairs = (
        both.join(du, both["u"] == du["_su"])
        .join(dv, both["v"] == dv["_sv"])
        .select("dx", "dy")
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("M"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.max("dx").alias("max_deg"),
    )
    nv = deg.agg(F.count(F.lit(1)).alias("n_vertices"))
    num = F.col("M") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("M") * F.col("sxx") - F.col("sx") * F.col("sx")
    from crgp_spark.functions import decimal_round

    return (
        m.crossJoin(F.broadcast(nv))
        .select(
            "n_vertices",
            (F.col("M") / 2).cast("long").alias("n_edges"),
            F.col("max_deg").cast("int").alias("max_deg"),
            decimal_round(
                F.col("M").cast("double")
                / (
                    F.col("n_vertices").cast("double")
                    * (F.col("n_vertices") - 1).cast("double")
                ),
                6,
            ).alias("density"),
            decimal_round(
                F.col("M").cast("double") / F.col("n_vertices").cast("double"),
                6,
            ).alias("avg_deg"),
            decimal_round(
                num.cast("double") / den.cast("double"), 6
            ).alias("assortativity"),
        )
    )
