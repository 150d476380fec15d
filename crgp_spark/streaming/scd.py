"""Streamed SCD Type-2 maintenance on the keyed state store.

The streaming twin of ``operators/scd.py::scd2_history``: the open
(current) version of every key lives in ``applyInPandasWithState``
state; each micro-batch folds its events into that state in event-time
order, emitting a row when a version OPENS (``valid_to`` NULL) and
again when it CLOSES (``valid_to`` set).  A tiny batch-side rollup
(`final_history`) reconciles the at-most-two emissions per version —
a closed emission supersedes its open one — yielding exactly the batch
operator's output.

Ordering contract: SCD2 is an order-sensitive fold (NOT a commutative
monoid like the windowed-agg / dedup / session paths), so stream ==
batch requires per-key events to arrive in event-time order across
micro-batches.  `write_time_chunks` constructs that: it splits the
input into N files by global ``(ts, event_id)`` rank and writes them
sequentially (ascending mtime AND ascending path), which Spark's file
source replays in order under ``maxFilesPerTrigger=1``.  An unbounded
deployment would put a reorder buffer (watermark-delayed emission) in
front of the fold; the fold itself is unchanged.

Scale shape: state is one tuple per key — O(|keys|) across the
state-store partitions, independent of history length; each batch
shuffles only its own events by key.  This is how a 100 TB dimension
stays current without re-folding its full history per refresh.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: open version per key: tracked attribute value, its valid_from, and
#: a per-key version sequence (monotone; makes version identity robust
#: to several changes at one timestamp — valid_from alone is NOT unique)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("attr", T.StringType(), True),
        T.StructField("from_us", T.LongType(), True),
        T.StructField("ver", T.LongType(), True),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("valid_from", T.LongType(), False),
        T.StructField("valid_to", T.LongType(), True),
        T.StructField("ver", T.LongType(), False),
    ]
)


def _neq(a, b) -> bool:
    if (a is None) != (b is None):
        return True
    return a is not None and a != b


def _scd_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch rows (sorted by event time) into the
    open-version state; emit opened/closed version rows."""
    user_id = key[0]
    if state.exists:
        attr, from_us, ver = state.get
        from_us, ver = int(from_us), int(ver)
        has_open = True
    else:
        attr, from_us, ver, has_open = None, None, -1, False

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["us", "event_id"], kind="stable")

    out_attr: list = []
    out_from: list = []
    out_to: list = []
    out_ver: list = []
    for us, new_attr in zip(rows["us"].astype(int), rows["event_type"]):
        new_attr = None if pd.isna(new_attr) else new_attr
        if not has_open:
            attr, from_us, ver, has_open = new_attr, int(us), ver + 1, True
            out_attr.append(attr)
            out_from.append(from_us)
            out_to.append(None)
            out_ver.append(ver)
        elif _neq(new_attr, attr):
            out_attr.append(attr)
            out_from.append(from_us)
            out_to.append(int(us))
            out_ver.append(ver)
            attr, from_us, ver = new_attr, int(us), ver + 1
            out_attr.append(attr)
            out_from.append(from_us)
            out_to.append(None)
            out_ver.append(ver)

    state.update((attr, from_us, ver))
    yield pd.DataFrame(
        {
            "user_id": pd.array([user_id] * len(out_attr), dtype="Int64"),
            "event_type": out_attr,
            "valid_from": pd.array(out_from, dtype="Int64"),
            "valid_to": pd.array(out_to, dtype="Int64"),
            "ver": pd.array(out_ver, dtype="Int64"),
        }
    )


def write_time_chunks(
    df: DataFrame, work_dir: str, n_chunks: int = 4
) -> None:
    """Materialize ``df`` (must carry ``us`` and ``event_id``) as
    ``n_chunks`` parquet files in global ``(us, event_id)`` order —
    ascending mtime and path, so the file source replays event time in
    order.  Test/benchmark input prep, not a data-path operator (the
    global sort is the point, and a production feed would already be
    time-ordered, e.g. Kafka per-partition order or hourly drops)."""
    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir)
    ranked = df.withColumn(
        "_rn", F.row_number().over(Window.orderBy("us", "event_id"))
    ).persist()
    n = ranked.count()
    step = max(1, (n + n_chunks - 1) // n_chunks)
    for k in range(n_chunks):
        chunk = ranked.where(
            (F.col("_rn") > k * step) & (F.col("_rn") <= (k + 1) * step)
        ).drop("_rn")
        tmp = os.path.join(work_dir, f"_tmp{k}")
        chunk.coalesce(1).write.parquet(tmp)
        [part] = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        os.replace(
            os.path.join(tmp, part),
            os.path.join(work_dir, f"chunk{k:04d}.parquet"),
        )
        shutil.rmtree(tmp)
        time.sleep(0.05)  # distinct mtimes: replay order == chunk order
    ranked.unpersist()


def stream_scd2(
    spark: SparkSession,
    in_dir: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Drain a time-chunked update stream (``availableNow``) through
    the keyed-state SCD2 fold; returns the raw emission log
    ``(user_id, event_type, valid_from, valid_to)`` — feed it to
    `final_history` for the reconciled dimension."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    folded = stream.groupBy("user_id").applyInPandasWithState(
        _scd_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"scd2_{uuid.uuid4().hex[:8]}"
    q = (
        folded.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def final_history(emissions: DataFrame) -> DataFrame:
    """Reconcile the emission log: per ``(user_id, ver)`` — version
    identity, NOT ``valid_from``, which is not unique when several
    changes share one timestamp — the closed emission (non-NULL
    ``valid_to``) supersedes the open one: MAX ignores NULLs, and a
    version closes at most once.  Output matches
    ``operators/scd.py::scd2_history`` column-for-column."""
    return (
        emissions.groupBy("user_id", "ver")
        .agg(
            F.min("event_type").alias("event_type"),
            F.min("valid_from").alias("valid_from"),
            F.max("valid_to").alias("valid_to"),
        )
        .select(
            "user_id",
            "event_type",
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
