"""Streamed funnel conversion — the 14th gated stream==batch path.

The streaming twin of ``operators/cohort.py::funnel_counts``: the
batch funnel needs only each user's FIRST-touch timestamp per stage,
and per-stage MIN is a commutative monoid — so the streaming state is
the per-user min-vector ``(t0..tN)`` maintained by a NATIVE streaming
aggregation (update-state-on-arrival, no custom fold): O(stages)
numbers per user, independent of event volume and of micro-batch
slicing.  Unlike the order-sensitive carry paths (cusum, SCD2) this
one needs NO ordering contract at all — minimum is order-free, so any
shuffling of events across micro-batches drains to the identical
funnel row, certified in the driver gate by the SAME oracle SQL as
the batch ``funnel`` entry.

The chained stage flags (cleared_i = cleared_{i-1} AND t_i >= t_{i-1})
fold AFTER the drain on the mins table — one metadata-sized pass, the
exact code path the batch operator uses (`funnel_from_mins`).

The reference has no multi-stage conversion operator (its per-user
state is the single retweet-seen flag, ``leaf.rs:53-66``); a funnel
over the live event feed is the canonical streaming-analytics shape
on top of that same keyed-state idea.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.operators.cohort import funnel_from_mins


def stream_funnel(
    spark: SparkSession,
    in_dir: str,
    stages: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Drain a parquet event stream (``availableNow``, capped
    micro-batches) carrying ``(user_id, event_type, us)`` through the
    per-user min-vector state; returns the one-row batch-identical
    funnel ``(n_<stage> ...)``."""
    if len(stages) < 2:
        raise ValueError("need at least two funnel stages")
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    agg = stream.groupBy("user_id").agg(
        *[
            F.min(
                F.when(F.col("event_type") == s, F.col("us"))
            ).alias(f"t{i}")
            for i, s in enumerate(stages)
        ]
    )
    name = f"funnel_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return funnel_from_mins(spark.table(name), stages)
