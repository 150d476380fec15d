"""Streamed CUSUM drift charts on the keyed state store — the 12th
gated stream==batch path.

The streaming twin of ``operators/cusum.py::cusum_chart``: the Page
recursion ``C_t = max(0, C_{t-1} + (x_t - k))`` looks like it needs the
whole history, but its closed prefix form ``C_t = S_t - min(0, min
prefix S)`` folds through a THREE-NUMBER carry per key —

    (rn0, S0, M0)   rows seen, prefix sum, min(0, min prefix S)

— so each micro-batch is one vectorized pandas pass (``cumsum`` +
``cummin`` shifted by the carry), state is O(|keys|) regardless of
history length, and the drained chart is bit-identical to the batch
window pass.  All arithmetic is the same cross-multiplied BIGINT
algebra as the batch operator (drift ``k = k_num/k_den``, alarm
``C/k_den > h_num/h_den``) — no floats anywhere, so stream == batch is
exact, certified in the driver gate by the SAME oracle SQL as the
batch ``cusum`` entry.

Ordering contract: CUSUM is an order-sensitive fold, so stream == batch
requires per-key rows to arrive in event-time order across
micro-batches — the same contract (and the same ``write_time_chunks``
input prep) as the streamed SCD2 path; an unbounded deployment puts a
watermark-delayed reorder buffer in front, the fold is unchanged.

The reference has no monitoring operator (its stats are terminal
counters, ``statistics.rs:17-131``); a drift watch over the live event
feed is the natural streaming deployment of the batch chart.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: per-key carry: rows seen, running term sum S, min(0, min prefix S)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("rn0", T.LongType(), False),
        T.StructField("s0", T.LongType(), False),
        T.StructField("m0", T.LongType(), False),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("rn", T.IntegerType(), False),
        T.StructField("x", T.LongType(), True),
        T.StructField("cusum_scaled", T.LongType(), False),
        T.StructField("alarm", T.BooleanType(), False),
    ]
)


def _make_fold(k_num: int, k_den: int, h_num: int, h_den: int):
    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rn0, s0, m0 = state.get if state.exists else (0, 0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["us", "event_id"], kind="stable")
        x = rows["x"].astype("int64")
        s = s0 + (x * k_den - k_num).cumsum()  # S_t continued from carry
        m = s.cummin().clip(upper=m0)  # min(m0, running min of S)
        cus = s - m
        state.update(
            (int(rn0) + len(rows), int(s.iloc[-1]), int(m.iloc[-1]))
        )
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(rows),
                "rn": pd.array(
                    range(int(rn0) + 1, int(rn0) + len(rows) + 1),
                    dtype="int32",
                ),
                "x": x.to_numpy(),
                "cusum_scaled": cus.to_numpy(),
                "alarm": (cus * h_den > h_num * k_den).to_numpy(),
            }
        )

    return fold


def stream_cusum(
    spark: SparkSession,
    in_dir: str,
    k_num: int,
    k_den: int = 1,
    h_num: int = 0,
    h_den: int = 1,
    key_col: str = "key",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Drain a time-chunked ``(key, us, event_id, x)`` parquet stream
    (``availableNow``) through the keyed CUSUM carry; returns the full
    per-row chart ``(key, rn, x, cusum_scaled, alarm)`` — identical to
    batch ``cusum_chart`` over the concatenated input."""
    if k_den <= 0 or h_den <= 0:
        raise ValueError("k_den and h_den must be positive")
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir).withColumnRenamed(key_col, "key")
    folded = stream.groupBy("key").applyInPandasWithState(
        _make_fold(k_num, k_den, h_num, h_den),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"cusum_{uuid.uuid4().hex[:8]}"
    q = (
        folded.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
