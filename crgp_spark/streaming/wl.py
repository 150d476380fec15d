"""Streamed incremental 1-WL refinement — the 20th gated stream==batch
path: the 2-round Weisfeiler-Leman color tables kept live while the
edge table streams in, recomputing only the vertices whose colors can
have changed.

Locality argument (why the drain equals the batch run): round-r colors
are a function of the r-hop neighborhood, so after a batch of new
edges only vertices within r hops of a new endpoint can change at
round r.  The maintainer keeps the canonical edge set plus the full
c0 (degree) / c1 / c2 color tables; per epoch it

1. bumps degrees at the new endpoints (an exact +delta merge),
2. recomputes c1 on ``ball1 = endpoints ∪ N(endpoints)`` — each
   signature reads the UPDATED full c0 of all its neighbors,
3. recomputes c2 on ``ball2 = ball1 ∪ N(ball1)`` from the updated c1,

carrying every color outside the ball unchanged.  Induction over
epochs gives c2 == `operators.wl.wl_refine(all_edges, rounds=2)`,
certified in the driver gate by the SAME oracle as the batch
``wl_colors`` entry.

Cost per epoch at 100 TB: proportional to the 2-hop ball of the batch
(the same locality GNN mini-batch samplers exploit), never a full
recolor; the signature recomputation is the identical
sort_array/collect_list + md5_num60 expression as the batch operator.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.functions import md5_num60

__all__ = ["WlMaintainer", "stream_wl"]


def _canon(df: DataFrame) -> DataFrame:
    return (
        df.select(
            F.least("src", "dst").cast("long").alias("u"),
            F.greatest("src", "dst").cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


class WlMaintainer:
    """foreachBatch sink holding the edge set and the c0/c1/c2 tables."""

    def __init__(self, spark: SparkSession, cfg: EngineConfig | None = None):
        self.spark = spark
        self.cfg = cfg or EngineConfig()
        self.edges: DataFrame | None = None
        self.c0: DataFrame | None = None  # (vid, color) = degree
        self.c1: DataFrame | None = None
        self.c2: DataFrame | None = None
        self.epochs = 0

    def _adj(self) -> DataFrame:
        e = self.edges
        return e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            e.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )

    def _recolor(self, targets: DataFrame, prev: DataFrame) -> DataFrame:
        """Round signature for ``targets`` (vid) against the FULL
        ``prev`` color table — the batch operator's exact expression."""
        adj = self._adj().join(
            targets.withColumnRenamed("vid", "a"), "a", "left_semi"
        )
        nbrs = (
            adj.join(
                prev.select(F.col("vid").alias("b"), F.col("color").alias("bc")),
                "b",
            )
            .groupBy(F.col("a").alias("vid"))
            .agg(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("bc")),
                        lambda x: x.cast("string"),
                    ),
                ).alias("nbrs")
            )
        )
        return nbrs.join(prev, "vid").select(
            "vid",
            md5_num60(
                F.concat(
                    F.col("color").cast("string"), F.lit("|"), F.col("nbrs")
                )
            ).alias("color"),
        )

    @staticmethod
    def _patch(full: DataFrame | None, part: DataFrame) -> DataFrame:
        if full is None:
            return part
        return full.join(
            part.select("vid"), "vid", "left_anti"
        ).unionByName(part)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        fresh = _canon(batch_df)
        if self.edges is not None:
            fresh = fresh.join(self.edges, ["u", "v"], "left_anti")
        fresh = fresh.localCheckpoint(eager=True)
        if fresh.isEmpty():
            return
        self.edges = (
            fresh if self.edges is None
            else self.edges.unionByName(fresh)
        ).localCheckpoint(eager=True)

        # c0: exact degree deltas at the new endpoints
        ddeg = (
            fresh.select(F.col("u").alias("vid"))
            .unionAll(fresh.select(F.col("v").alias("vid")))
            .groupBy("vid")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        if self.c0 is None:
            c0 = ddeg.select("vid", F.col("d").alias("color"))
        else:
            c0 = (
                self.c0.join(ddeg, "vid", "full_outer")
                .select(
                    "vid",
                    (
                        F.coalesce("color", F.lit(0).cast("long"))
                        + F.coalesce("d", F.lit(0).cast("long"))
                    ).alias("color"),
                )
            )
        self.c0 = c0.localCheckpoint(eager=True)

        adj = self._adj()
        touched = ddeg.select("vid").localCheckpoint(eager=True)
        ball1 = (
            touched.unionByName(
                adj.join(
                    touched.withColumnRenamed("vid", "b"), "b", "left_semi"
                ).select(F.col("a").alias("vid"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        self.c1 = self._patch(
            self.c1, self._recolor(ball1, self.c0)
        ).localCheckpoint(eager=True)

        ball2 = (
            ball1.unionByName(
                adj.join(
                    ball1.withColumnRenamed("vid", "b"), "b", "left_semi"
                ).select(F.col("a").alias("vid"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        self.c2 = self._patch(
            self.c2, self._recolor(ball2, self.c1)
        ).localCheckpoint(eager=True)
        self.epochs += 1


def stream_wl(
    spark: SparkSession,
    in_dir: str,
    cfg: EngineConfig | None = None,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Drain a chunked edge-table parquet feed through the incremental
    WL maintainer; returns ``(vid, color)`` equal to the batch
    ``wl_refine(all_edges, rounds=2)``."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    m = WlMaintainer(spark, cfg)
    q = (
        stream.writeStream.foreachBatch(m.process_batch)
        .queryName(f"wl_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if m.c2 is None:
        return spark.createDataFrame([], "vid long, color long")
    return m.c2
