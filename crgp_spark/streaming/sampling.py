"""Streamed exact-quota stratified sampling — the 15th gated
stream==batch path, and the BOUNDED-state analog of the reservoir:
per stratum the keyed state is the ``quota`` smallest
``(md5_num60(key), key)`` pairs seen so far.

The streaming twin of ``operators/sampling.py::stratified_sample``:
"bottom-R of a hash order" is an order-free fold — the bottom-R of a
multiset union is the bottom-R of the two bottom-Rs, a commutative
idempotent monoid — so ANY slicing of the feed into micro-batches
drains to the identical sample, certified in the driver gate by the
SAME naive full-sort ``ROW_NUMBER() <= quota`` oracle as the batch
entry. This is the property that makes hash-order sampling the
production choice over true reservoir sampling, whose state depends on
arrival order and can never be cross-checked against a batch oracle.

State per stratum is exactly ``quota`` (ord, key) pairs — constant in
stream length — and each micro-batch is one vectorized lexsort +
truncate over (state ∪ batch), never a per-row Python loop. Every
batch emits the current sample with a monotone ``version`` (total rows
seen for the stratum); the drain keeps the max-version row per stratum
— the same last-write-wins convention as the other update-shaped
paths.

The reference processes its input as one logical batch (run.rs
epoch loop); a live "keep a reproducible N-per-source sample of the
feed" is the canonical streaming form of its per-source accounting.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: per-stratum bottom-quota of the hash order, plus rows-seen counter
STATE_SCHEMA = T.StructType(
    [
        T.StructField("ords", T.ArrayType(T.LongType()), True),
        T.StructField("ids", T.ArrayType(T.LongType()), True),
        T.StructField("seen", T.LongType(), True),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("stratum", T.StringType(), True),
        T.StructField("version", T.LongType(), False),
        T.StructField("ords", T.ArrayType(T.LongType()), False),
        T.StructField("ids", T.ArrayType(T.LongType()), False),
    ]
)


def _make_fold(quota: int):
    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        b_ord, b_id, seen = (
            state.get if state.exists else ([], [], 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        ords = np.concatenate(
            [np.asarray(b_ord, np.int64), rows["ord"].to_numpy(np.int64)]
        )
        ids = np.concatenate(
            [np.asarray(b_id, np.int64), rows["id"].to_numpy(np.int64)]
        )
        # bottom-quota of the (ord, id) lexicographic order — one
        # vectorized lexsort; id is the unique tie-break, so the result
        # is a pure function of the SET seen so far
        order = np.lexsort((ids, ords))[:quota]
        order.sort()  # keep ascending (ord, id) in the state arrays
        ords, ids = ords[order], ids[order]
        seen = int(seen) + len(rows)
        state.update((ords.tolist(), ids.tolist(), seen))
        yield pd.DataFrame(
            {
                "stratum": [key[0]],
                "version": np.int64(seen),
                "ords": [ords.tolist()],
                "ids": [ids.tolist()],
            }
        )

    return fold


def stream_stratified_sample(
    spark: SparkSession,
    in_dir: str,
    stratum_col: str,
    key_col: str,
    quota: int,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Drain a parquet feed (``availableNow``, capped micro-batches)
    through the per-stratum bottom-``quota`` keyed state; returns the
    exploded sample ``(key_col, stratum_col)`` — identical to batch
    ``stratified_sample`` over the concatenated input."""
    if quota <= 0:
        raise ValueError(f"quota must be > 0, got {quota}")
    from crgp_spark.functions import md5_num60

    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir).select(
        F.col(stratum_col).cast("string").alias("stratum"),
        F.col(key_col).cast("long").alias("id"),
        md5_num60(F.col(key_col).cast("string")).alias("ord"),
    )
    folded = stream.groupBy("stratum").applyInPandasWithState(
        _make_fold(quota),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"ssample_{uuid.uuid4().hex[:8]}"
    q = (
        folded.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last-write-wins per stratum (version is the strictly-increasing
    # rows-seen counter), then explode back to one row per sampled key
    w = Window.partitionBy("stratum").orderBy(F.col("version").desc())
    return (
        spark.table(name)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("stratum", F.explode("ids").alias("id"))
        .select(
            F.col("id").alias(key_col), F.col("stratum").alias(stratum_col)
        )
    )
