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

__all__ = [
    "ComponentMaintainer",
    "stream_components",
    "TriangleMaintainer",
    "stream_triangles",
]


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


class TriangleMaintainer:
    """foreachBatch sink for the 19th gated path: exact per-vertex
    triangle counts kept live while the edge table streams in.

    A triangle is counted exactly once — in the epoch its LAST edge
    arrives (it then contains >= 1 new edge, and could not have been
    complete earlier); candidates are generated from the new edges
    only, deduped as sorted vertex triples within the epoch, and
    already-seen edges are dropped by an anti-join so replays are
    idempotent.  Per-epoch work is proportional to the new edges'
    neighborhoods, never a full recount; the retained state is the
    canonical edge set itself (exact triangle counting needs the
    graph) plus the sparse count table."""

    def __init__(self, spark: SparkSession, cfg: EngineConfig | None = None):
        self.spark = spark
        self.cfg = cfg or EngineConfig()
        self.edges: DataFrame | None = None   # canonical (u, v), u < v
        self.counts: DataFrame | None = None  # sparse (vid, triangles)
        self.epochs = 0

    @staticmethod
    def _canon(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.least("src", "dst").cast("long").alias("u"),
                F.greatest("src", "dst").cast("long").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        fresh = self._canon(batch_df)
        if self.edges is not None:
            fresh = fresh.join(self.edges, ["u", "v"], "left_anti")
        fresh = fresh.localCheckpoint(eager=True)
        if fresh.isEmpty():
            return
        alledges = (
            fresh if self.edges is None
            else self.edges.unionByName(fresh)
        ).localCheckpoint(eager=True)

        adj = alledges.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            alledges.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        # candidates: for each new edge (u,v), w adjacent to u with
        # {v,w} also present; dedupe as sorted triples so a triangle
        # with 2-3 new edges still counts once
        cand = (
            fresh.join(adj.withColumnRenamed("a", "u"), "u")
            .filter(F.col("b") != F.col("v"))
            .join(
                alledges.select(
                    F.col("u").alias("_x"), F.col("v").alias("_y")
                ),
                (F.least("v", "b") == F.col("_x"))
                & (F.greatest("v", "b") == F.col("_y")),
                "left_semi",
            )
            .select(
                F.array_sort(F.array("u", "v", "b")).alias("t")
            )
            .distinct()
        )
        delta = (
            cand.select(F.explode("t").alias("vid"))
            .groupBy("vid")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        if self.counts is None:
            merged = delta.select("vid", F.col("d").alias("triangles"))
        else:
            merged = (
                self.counts.join(delta, "vid", "full_outer")
                .select(
                    "vid",
                    (
                        F.coalesce("triangles", F.lit(0).cast("long"))
                        + F.coalesce("d", F.lit(0).cast("long"))
                    ).alias("triangles"),
                )
            )
        self.edges = alledges
        self.counts = merged.localCheckpoint(eager=True)
        self.epochs += 1

    def result(self) -> DataFrame:
        """``(vid, triangles)`` over the full vertex universe, zeros
        included — the batch `triangles` output shape."""
        if self.edges is None:
            return self.spark.createDataFrame([], "vid long, triangles long")
        verts = (
            self.edges.select(F.col("u").alias("vid"))
            .unionByName(self.edges.select(F.col("v").alias("vid")))
            .distinct()
        )
        counts = self.counts
        return verts.join(counts, "vid", "left").select(
            "vid",
            F.coalesce("triangles", F.lit(0).cast("long")).alias("triangles"),
        )


def stream_triangles(
    spark: SparkSession,
    in_dir: str,
    cfg: EngineConfig | None = None,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Drain a chunked edge-table parquet feed through the incremental
    triangle maintainer; returns ``(vid, triangles)`` equal to the
    batch `operators.triangles` run over all edges."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    m = TriangleMaintainer(spark, cfg)
    q = (
        stream.writeStream.foreachBatch(m.process_batch)
        .queryName(f"tri_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return m.result()
