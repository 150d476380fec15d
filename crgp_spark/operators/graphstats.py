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
