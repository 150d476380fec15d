"""Streaming temporal earliest-arrival reachability — the 9th gated
stream==batch path: the ``operators/temporalreach.py`` fixpoint
maintained as the event log streams in epoch by epoch.

Two pieces of state cross epochs (both graph-sized, never log-sized):

- **per-channel carry**: the single latest event per channel seen so
  far — the LEAD succession edge that SPANS an epoch boundary is
  derived by re-including the carried row in the next epoch's window
  (the cross-epoch analog of `streaming/incremental.py`'s activation
  state, reference ``run.rs:118-129`` batching);
- **retained edges + arrival state**: edges must be RETAINED, because
  a previously-seen edge can become traversable only after a LATER
  epoch improves its source's arrival — one-pass, no-retention
  streaming is provably incorrect for temporal reachability. Each
  epoch warm-starts the batch fixpoint from the previous arrivals
  (label-correcting argument: every held arrival is an achievable
  path, so relaxation from it converges to the same least fixpoint as
  a cold start — this is what makes stream == batch hold under ANY
  epoch slicing).

Ordered-replay contract: epochs must arrive in ``(ts, event_id)`` order
per channel — the reference's batching driver replays its log in
exactly this order (``configuration/main.rs:44``), and the carry state
is meaningful only under it. The gated entry simulates an ordered log
by writing time-ranged files with ascending modification times.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.operators.temporalreach import earliest_arrival, temporal_edges


class ArrivalStream:
    """foreachBatch sink maintaining the earliest-arrival fixpoint."""

    def __init__(
        self,
        spark: SparkSession,
        seeds: DataFrame,
        cfg: EngineConfig | None = None,
        channel_col: str = "event_type",
        actor_col: str = "user_id",
    ):
        self.spark = spark
        self.cfg = cfg or EngineConfig()
        self.channel_col = channel_col
        self.actor_col = actor_col
        if "arrival" not in seeds.columns:
            seeds = seeds.select("vid", F.lit(0).alias("arrival"))
        self.state = (
            seeds.select("vid", F.col("arrival").cast("long").alias("arrival"))
            .groupBy("vid")
            .agg(F.min("arrival").alias("arrival"))
            .localCheckpoint(eager=True)
        )
        self.carry: DataFrame | None = None  # latest event per channel
        self.edges: DataFrame | None = None  # retained temporal edges

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        ev = batch_df.select(
            self.channel_col, "ts", "event_id", self.actor_col
        )
        base = ev if self.carry is None else self.carry.unionByName(ev)
        new_edges = temporal_edges(
            base, channel_col=self.channel_col, actor_col=self.actor_col
        )
        self.edges = (
            new_edges
            if self.edges is None
            else self.edges.unionByName(new_edges)
        ).localCheckpoint(eager=True)
        # next epoch's carry: the single max-(ts, event_id) row per
        # channel — combinable max_by, one metadata-sized result
        self.carry = (
            base.groupBy(self.channel_col)
            .agg(
                F.max_by(
                    F.struct("ts", "event_id", self.actor_col),
                    F.struct("ts", "event_id"),
                ).alias("_last")
            )
            .select(self.channel_col, "_last.*")
            .localCheckpoint(eager=True)
        )
        # warm-started batch fixpoint over the retained edges: held
        # arrivals are achievable paths, so this converges to the same
        # least fixpoint as a cold start over everything seen so far
        self.state = (
            earliest_arrival(self.spark, self.edges, self.state, self.cfg)
            .withColumnRenamed("arrival_us", "arrival")
            .localCheckpoint(eager=True)
        )

    def result(self) -> DataFrame:
        return self.state.select(
            "vid", F.col("arrival").alias("arrival_us")
        )


def stream_earliest_arrival(
    spark: SparkSession,
    in_dir: str,
    seeds: DataFrame,
    cfg: EngineConfig | None = None,
    max_files_per_trigger: int | None = 2,
    channel_col: str = "event_type",
    actor_col: str = "user_id",
) -> DataFrame:
    """Drain an ordered parquet event log (``availableNow``) through
    the epoch-wise arrival fixpoint; returns ``(vid, arrival_us)``
    equal to the batch ``earliest_arrival`` over the same events under
    any ``max_files_per_trigger`` slicing."""
    schema = spark.read.parquet(in_dir).schema
    sink = ArrivalStream(
        spark, seeds, cfg, channel_col=channel_col, actor_col=actor_col
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(in_dir)
        .writeStream.foreachBatch(sink.process_batch)
        .option(
            "checkpointLocation",
            os.path.join("/tmp", f"crgp_tr_ckpt_{uuid.uuid4().hex[:8]}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink.result()
