"""Small-file compaction planner (the OPTIMIZE / bin-packing step of
a lakehouse maintenance job).

Streaming sinks and per-epoch commits (our own
`streaming/incremental.py` included) leave partitions littered with
small files; read throughput at 100 TB dies on open() overhead long
before bandwidth.  This operator plans the rewrite: group each
partition's files into target-size bins with deterministic greedy
chain packing — files ordered largest-first, running byte total,
``bin = (cumsum - size) div target`` — one window, no joins.  A file
larger than the target gets its own bin (it is already compact).

Scale note: this windows over file METADATA (one row per file), not
data — a million files is a million rows, trivially window-able
per partition key; the `partition_col` is the lakehouse partition, so
the plan parallelizes exactly like the table.  Executing the plan is
then a ``coalesce``-free series of per-bin reads+writes driven by the
assignment table.

The same planner packs any (id, weight) stream into quota-bounded
groups — it is `seqpack.py`'s chain-packing idiom applied to files
(that module packs token sequences into context windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    id_col: str,
    size_col: str,
    target_bytes: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Assign each file to a rewrite bin: ``(partition_col?, id_col,
    size, bin, bin_bytes)``; ``bin_bytes`` is the bin's planned total.
    Bin ids are ordered but NOT dense — a file larger than the target
    advances the cumulative counter past intermediate ids (iterate the
    DISTINCT bins of the plan, not ``0..max``).  Deterministic: files
    order largest-first with ``id_col`` as tiebreak."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    parts = [partition_col] if partition_col else []
    sized = files.select(
        *parts, F.col(id_col), F.col(size_col).cast("long").alias("size")
    ).where(F.col("size") > 0)
    w = Window.partitionBy(*parts).orderBy(
        F.col("size").desc(), F.col(id_col)
    )
    cum = F.sum("size").over(w)
    binned = (
        sized.withColumn("_prior", cum - F.col("size"))
        # integer `div` (not double `/` + cast): exact at any byte count
        .withColumn("bin", F.expr(f"_prior div {int(target_bytes)}L"))
        .drop("_prior")
    )
    wb = Window.partitionBy(*parts, "bin")
    return binned.withColumn(
        "bin_bytes", F.sum("size").over(wb).cast("long")
    )
