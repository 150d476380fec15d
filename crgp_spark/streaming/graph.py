"""Streamed incremental connected components — the 18th gated
stream==batch path, and the first *streaming graph maintenance* one:
component labels kept live while the edge table itself streams in.

Per micro-batch (the classic contraction trick — union-find expressed
as a components run over a contracted graph): the previous labeling is
re-encoded as star edges ``(vid -> component root)``, unioned with the
new edge batch, and one `connected_components` pass over that graph
yields the updated labels.  Vertices untouched by the batch and not in
any star (prior singletons) keep their old label via a left join.

Why the drain equals the one-shot batch answer: connected components
is an order-free commutative fold over edges — labels(E1 ∪ E2) =
labels(contract(labels(E1)) ∪ E2) (contraction preserves reachability,
and min-vid labels survive because star edges carry the true component
minimum as an endpoint).  Any chunking of the edge feed therefore
lands on the same fixpoint, certified in the driver gate against the
SAME oracle as the batch ``components`` entry.

Cost per epoch at 100 TB: the contracted graph is |labeled vertices|
star edges + |batch| new edges — NEVER the full accumulated edge set;
the inner components run converges in O(log of the largest NEW merge
chain), typically 1-2 rounds once the graph is warm.  This is the
standard incremental-CC shape (the same contraction Kiveris et al.'s
star operations iterate inside one batch, applied across epochs).
Reference context: the engine's edge DERIVATION already streams
(streaming/incremental.py, gated r03); this path streams the
*analysis* layer above it (graph.rs:17-22 adjacency semantics).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.operators.components import connected_components

__all__ = ["ComponentMaintainer", "stream_components"]


class ComponentMaintainer:
    """foreachBatch sink holding the live ``(vid, component)`` table."""

    def __init__(self, spark: SparkSession, cfg: EngineConfig | None = None):
        self.spark = spark
        self.cfg = cfg or EngineConfig()
        self.labels: DataFrame | None = None
        self.epochs = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        edges = batch_df.select("src", "dst")
        if edges.isEmpty():
            return
        if self.labels is None:
            work = edges
            prior = None
        else:
            prior = self.labels
            stars = prior.filter(F.col("vid") != F.col("component")).select(
                F.col("vid").alias("src"), F.col("component").alias("dst")
            )
            work = stars.unionByName(edges)
        fresh = connected_components(
            self.spark, work, self.cfg,
            algo_name=f"stream_cc_{self.epochs}",
        )
        if prior is not None:
            # prior singletons untouched by this epoch keep their label
            carried = prior.join(
                fresh.select("vid"), "vid", "left_anti"
            )
            fresh = fresh.unionByName(carried)
        self.labels = fresh.localCheckpoint(eager=True)
        self.epochs += 1


def stream_components(
    spark: SparkSession,
    in_dir: str,
    cfg: EngineConfig | None = None,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Drain a chunked edge-table parquet feed (``availableNow``)
    through per-epoch incremental contraction; returns the final
    ``(vid, component)`` labeling — equal to one batch
    `connected_components` over all edges."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    m = ComponentMaintainer(spark, cfg)
    q = (
        stream.writeStream.foreachBatch(m.process_batch)
        .queryName(f"cc_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if m.labels is None:
        return spark.createDataFrame([], "vid long, component long")
    return m.labels
