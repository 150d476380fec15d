"""Out-of-order / late-data streaming semantics under the hard gate —
the 27th gated stream==batch path, and the first ORDER-DEPENDENT one.

Every other gated streaming path replays ordered epochs (the
reference's own input contract — its tar/JSON feed is batch-sequenced,
``get.rs:142-147``, and it has no watermark at all), so the
watermark-drop semantics of Structured Streaming were never exercised.
At 100 TB ingest is never perfectly ordered; this module feeds
DELIBERATELY SHUFFLED epochs through an append-mode watermarked window
aggregation and proves the drop/accept behavior equals a deterministic
batch filter.

Spark's observable semantics (measured on this engine's exact build —
all three rules verified against ``numRowsDroppedByWatermark`` and the
memory-sink output with boundary fixtures):

1. the watermark in effect while batch ``b`` is processed is
   ``max event time over batches ≤ b−1, floored to MILLISECONDS,
   minus the delay`` (the progress-reported value);
2. the LATE-ROW FILTER of batch ``b`` uses the watermark reported for
   batch ``b−1`` (one-batch lag): a row is accepted iff its window
   end is STRICTLY greater than ``wm_report(b−1)`` — at equality it
   is dropped;
3. append-mode EVICTION/EMISSION at batch ``b`` uses the current
   ``wm_report(b)``: a window is emitted once its end is ≤ the
   watermark; windows still open when the bounded drain ends are
   never emitted.

Rules 2+3 together imply NO window can be emitted twice: eviction at
batch ``e`` requires ``end ≤ wm_report(e)``, and any later batch
``b > e`` filters with ``wm_report(b−1) ≥ wm_report(e)``, so a row
for an evicted window can never be accepted again.  The final output
is therefore exactly

    windows with end ≤ final_wm, counted over rows accepted per rule 2

— a pure batch computation over (row, arrival-epoch) pairs, which the
DuckDB oracle twin replays from the same deterministic epoch slicing.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crgp_spark.functions import ts_micros

__all__ = ["write_shuffled_chunks", "stream_late_counts", "late_batch_twin"]


def write_shuffled_chunks(
    df: DataFrame,
    work_dir: str,
    order: list[int],
) -> None:
    """Slice ``df`` (must carry ``us`` and ``event_id``) into
    ``len(order)`` equal chunks of the global ``(us, event_id)`` order,
    then write chunk ``order[i]`` as the ``i``-th file (ascending mtime
    and path) — the file source replays event time in the PERMUTED
    order.  ``order`` must be a permutation of ``range(len(order))``.

    Test/benchmark input prep, not a data-path operator — the
    controlled disorder is the point (a production feed's disorder is
    whatever the transport gives it)."""
    n_chunks = len(order)
    if sorted(order) != list(range(n_chunks)):
        raise ValueError(f"order must be a permutation, got {order}")
    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir)
    ranked = df.withColumn(
        "_rn", F.row_number().over(Window.orderBy("us", "event_id"))
    ).persist()
    n = ranked.count()
    step = max(1, (n + n_chunks - 1) // n_chunks)
    for i, k in enumerate(order):
        chunk = ranked.where(
            (F.col("_rn") > k * step) & (F.col("_rn") <= (k + 1) * step)
        ).drop("_rn")
        tmp = os.path.join(work_dir, f"_tmp{i}")
        chunk.coalesce(1).write.parquet(tmp)
        [part] = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        os.replace(
            os.path.join(tmp, part),
            os.path.join(work_dir, f"chunk{i:04d}.parquet"),
        )
        shutil.rmtree(tmp)
        time.sleep(0.05)  # distinct mtimes: replay order == file order
    ranked.unpersist()


def stream_late_counts(
    spark: SparkSession,
    in_dir: str,
    window: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """Append-mode watermarked tumbling-window aggregation over the
    (deliberately out-of-order) file stream, one file per micro-batch:
    ``(window_start epoch-seconds, event_type, n_events, total_cents)``
    — ONLY the windows closed by the final watermark, counting ONLY
    the rows that beat the late filter.  Value totals in integer
    cents, so acceptance-set equality ⇒ bit-for-bit equality with the
    batch twin."""
    schema = spark.read.parquet(in_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("total_cents"),
        )
        .select(
            (ts_micros(F.col("window.start")) / F.lit(1_000_000))
            .cast("long")
            .alias("window_start"),
            "event_type",
            "n_events",
            "total_cents",
        )
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def late_batch_twin(
    feed: DataFrame,
    n_chunks: int,
    order: list[int],
    window_us: int = 3_600_000_000,
    delay_ms: int = 7_200_000,
) -> DataFrame:
    """The deterministic batch filter the stream must equal: replays
    the measured semantics (module docstring rules 1–3) over the SAME
    slicing `write_shuffled_chunks` produced.  ``feed`` must carry
    ``us``, ``event_id``, ``event_type``, ``value``.

    Used by the stream==batch pytest; the driver-gate oracle is the
    equivalent DuckDB SQL."""
    spark = feed.sparkSession
    step_n = feed.count()
    step = max(1, (step_n + n_chunks - 1) // n_chunks)
    arrival = {k: i for i, k in enumerate(order)}
    amap = F.create_map(
        *[F.lit(x) for kv in arrival.items() for x in kv]
    )
    rows = feed.withColumn(
        "_rn", F.row_number().over(Window.orderBy("us", "event_id"))
    ).withColumn(
        "_slice", ((F.col("_rn") - 1) / step).cast("int")
    ).withColumn("_b", amap[F.col("_slice")])
    # per-batch max event time, ms-floored (rule 1)
    bmax = rows.groupBy("_b").agg(
        (F.max("us") / 1000).cast("long").alias("_bmax_ms")
    )
    w_lag = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -2
    )
    wm = bmax.withColumn(
        "_wm_us",
        (F.max("_bmax_ms").over(w_lag) - F.lit(delay_ms)) * 1000,
    ).select("_b", "_wm_us")
    final_wm_us = (
        bmax.agg(
            ((F.max("_bmax_ms") - F.lit(delay_ms)) * 1000).alias("w")
        ).collect()[0][0]
    )
    win_start = (F.col("us") - F.col("us") % window_us).cast("long")
    accepted = (
        rows.join(wm, "_b", "left")
        .withColumn("_ws", win_start)
        .filter(
            F.col("_wm_us").isNull()
            | (F.col("_ws") + window_us > F.col("_wm_us"))
        )
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        accepted.filter(F.col("_ws") + window_us <= F.lit(final_wm_us))
        .groupBy("_ws", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("total_cents"),
        )
        .select(
            (F.col("_ws") / 1_000_000).cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "total_cents",
        )
    )
