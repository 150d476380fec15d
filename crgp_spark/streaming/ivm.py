"""Streamed incremental view maintenance — the 16th gated
stream==batch path: a materialized count+sum rollup kept in sync with
a live CDC changelog, epoch by epoch, without ever re-aggregating the
facts.

The streaming twin of ``operators/ivm.py::maintain_rollup``.  Each
micro-batch is one delta-propagation step (Gupta & Mumick counting
algorithm): the batch's change frontier retracts the CURRENT payload
of every touched key out of the view and inserts the winning upsert
payloads, then the maintained key snapshot absorbs the same frontier
(``diff.apply_changes``).  Both state tables are re-checkpointed per
epoch so lineage stays one step deep — the same discipline as every
iterative operator here (CLAUDE.md superstep rule).

Why sequential epochs equal the one-shot batch answer: the feed is
replayed in ``order_cols`` order across epochs (``write_time_chunks``
contract — a production feed is Kafka per-partition order or hourly
drops), so the LAST epoch that touches a key holds that key's global
winning change, and each epoch's retraction sees exactly the payload
the previous epochs left in the snapshot.  Induction over epochs gives
view_k = rollup(apply_changes(base, changes_1..k)) — certified in the
driver gate by the SAME full-recompute oracle as the batch ``ivm``
entry.

Cost model per epoch at 100 TB: the only contact with the base-sized
snapshot is one touched-key semi-join (bloom/zone-map prunable) plus
the left-anti rewrite of ``apply_changes`` — O(changes + touched keys)
work against the view, never a fact rescan.  The view merge is
|touched groups| + |view| rows.  The reference processes its input as
one logical batch (run.rs epoch loop); "keep a segment rollup live
under upserts and deletes" is the canonical streaming form of its
statistics aggregation (statistics.rs:17-131).
"""

from __future__ import annotations

import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from crgp_spark.operators.diff import apply_changes
from crgp_spark.operators.ivm import maintain_rollup, rollup_view

__all__ = ["RollupMaintainer", "stream_maintain_rollup"]


class RollupMaintainer:
    """foreachBatch sink holding the two state tables: the keyed
    snapshot (base with all drained changes applied) and the
    maintained rollup view.  Driver-side handles only — the data
    lives in executor-block localCheckpoints."""

    def __init__(
        self,
        base: DataFrame,
        key_cols: Sequence[str],
        order_cols: Sequence[str],
        group_cols: Sequence[str],
        val_col: str,
        op_col: str = "op",
    ) -> None:
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.group_cols = list(group_cols)
        self.val_col = val_col
        self.op_col = op_col
        self.snapshot = base.localCheckpoint(eager=True)
        self.view = rollup_view(base, self.group_cols, val_col).localCheckpoint(
            eager=True
        )
        self.epochs = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # view first (retraction must read the PRE-batch snapshot),
        # then the snapshot absorbs the same frontier
        new_view = maintain_rollup(
            self.snapshot,
            batch_df,
            key_cols=self.key_cols,
            order_cols=self.order_cols,
            group_cols=self.group_cols,
            val_col=self.val_col,
            op_col=self.op_col,
            base_agg=self.view,
        ).localCheckpoint(eager=True)
        new_snapshot = apply_changes(
            self.snapshot,
            batch_df,
            self.key_cols,
            self.order_cols,
            op_col=self.op_col,
        ).localCheckpoint(eager=True)
        self.view = new_view
        self.snapshot = new_snapshot
        self.epochs += 1


def stream_maintain_rollup(
    spark: SparkSession,
    base: DataFrame,
    in_dir: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    group_cols: Sequence[str],
    val_col: str,
    op_col: str = "op",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Drain a time-chunked CDC parquet feed (``availableNow``) through
    per-epoch delta propagation; returns the final maintained view
    ``(group_cols..., n, total)`` — equal to
    ``rollup_view(apply_changes(base, all_changes))``."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    maintainer = RollupMaintainer(
        base, key_cols, order_cols, group_cols, val_col, op_col
    )
    q = (
        stream.writeStream.foreachBatch(maintainer.process_batch)
        .queryName(f"ivm_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return maintainer.view
