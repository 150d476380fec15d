"""Streamed MERGE INTO a snapshot table — the 17th gated stream==batch
path: a live CDC changelog drained epoch-by-epoch into a
:class:`~crgp_spark.sources.snapshot.SnapshotTable`, one copy-on-write
MERGE commit per micro-batch, with every intermediate table version
left time-travel readable.

This is the canonical production streaming sink shape (Structured
Streaming ``foreachBatch`` + ``MERGE INTO`` on a lakehouse table —
the pattern both the Delta and Iceberg docs ship): the file source
replays the feed in ``order_cols`` order (``write_time_chunks``
contract — Kafka per-partition order / hourly drops in production),
each epoch reduces its slice to the per-key frontier and commits
``SnapshotTable.merge_cdc``; induction over epochs gives
``HEAD == apply_changes(base, changes_1..k)``, certified in the driver
gate against the SAME DuckDB oracle as the batch ``cdc_apply`` entry.

Epoch k's commit equals ``apply_changes(base, chunks_1..k)``, so the
snapshot log doubles as a CDC audit trail: ``read(as_of=k)`` is the
table as of the k-th drained epoch (tested in
``tests/test_stream_merge.py``).

Cost per epoch: frontier reduction is O(batch); the commit rewrites
untouched rows copy-on-write (honest Iceberg-v1 MERGE semantics — at
100 TB a real deployment swaps in merge-on-read deletion vectors, the
documented SnapshotTable seam; the streaming drain logic above it is
unchanged).  The reference processes its whole input as one logical
batch (run.rs epoch loop); keeping a keyed snapshot current under a
replayed changelog is the streaming form of its write sink
(write.rs:38-114).
"""

from __future__ import annotations

import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from crgp_spark.sources.snapshot import SnapshotTable

__all__ = ["CdcMerger", "stream_merge_cdc"]


class CdcMerger:
    """foreachBatch sink committing one MERGE per micro-batch."""

    def __init__(
        self,
        table: SnapshotTable,
        key_cols: Sequence[str],
        order_cols: Sequence[str],
        op_col: str = "op",
    ) -> None:
        self.table = table
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.op_col = op_col
        self.epochs = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self.table.merge_cdc(
            batch_df.sparkSession,
            batch_df,
            self.key_cols,
            self.order_cols,
            op_col=self.op_col,
        )
        self.epochs += 1


def stream_merge_cdc(
    spark: SparkSession,
    table: SnapshotTable,
    in_dir: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Drain a time-chunked CDC parquet feed (``availableNow``) into
    ``table`` via per-epoch MERGE commits; returns the final HEAD read
    — equal to ``apply_changes(base, all_changes)``."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    merger = CdcMerger(table, key_cols, order_cols, op_col)
    q = (
        stream.writeStream.foreachBatch(merger.process_batch)
        .queryName(f"merge_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table.read(spark)
