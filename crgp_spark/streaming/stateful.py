"""Stateful streaming derivation with Spark's keyed state store
(``applyInPandasWithState``) — the state-store-native variant of
``streaming/incremental.py``.

The reference keeps its activation map as per-worker operator state
across epochs (``reconstruct.rs:41-44``); ``incremental.py`` models
that with versioned parquet state + a manifest. This module instead
holds the state where Structured Streaming holds state: one state-store
entry per ``conv_id`` containing the conversation's first-activation
map and its originator. Edges for each micro-batch's turns are emitted
against the merged state — identical semantics to the batch derivation
under the engine's stable-turn-order input contract (the analog of the
reference's sorted-by-``created_at`` contract, ``get.rs:142-147``).

Scale notes: state is partitioned by ``conv_id`` across
``spark.sql.shuffle.partitions`` state-store partitions — the same
conversation-locality the cascade layout exploits; per-conversation
state is O(participants), not O(turns). Fault tolerance (WAL +
checkpointed state) and exactly-once file output come from Structured
Streaming itself rather than the hand-built manifest protocol.

The kernel is Arrow-batched per group (no per-row Python *UDFs*; the
per-group loop is the state-transition function itself, the
``applyInPandasWithState`` contract).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from crgp_spark.functions import participant, ts_micros

#: per-conversation state: parallel arrays = the activation map
#: (participant -> first (turn, ts)), plus the originator.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("participants", T.ArrayType(T.StringType()), True),
        T.StructField("act_turns", T.ArrayType(T.IntegerType()), True),
        T.StructField("act_ts", T.ArrayType(T.LongType()), True),
        T.StructField("orig_turn", T.IntegerType(), True),
        T.StructField("orig_participant", T.StringType(), True),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("src_turn", T.IntegerType(), False),
        T.StructField("src_participant", T.StringType(), False),
        T.StructField("dst_turn", T.IntegerType(), False),
        T.StructField("dst_participant", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("orig_turn", T.IntegerType(), False),
    ]
)


def _derive_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """State transition for one conversation and one micro-batch:
    merge first-activations forward, emit influence edges for THIS
    batch's turns against the merged map (strict ``act_ts < ts`` or
    originator — ``reconstruct.rs:83``/``leaf.rs:53-66``)."""
    conv_id = key[0]
    if state.exists:
        parts, a_turns, a_ts, orig_turn, orig_part = state.get
        acts = {
            p: (int(t), int(s))
            for p, t, s in zip(parts, a_turns, a_ts)
        }
        orig = (int(orig_turn), orig_part)
    else:
        acts, orig = {}, None

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("turn_idx", kind="stable")
    turns = list(
        zip(
            rows["turn_idx"].astype(int),
            rows["participant"],
            rows["ts"].astype(int),
        )
    )

    # 1) merge activations (first-wins on turn_idx) + originator
    for turn, part, ts in turns:
        cur = acts.get(part)
        if cur is None or turn < cur[0]:
            acts[part] = (turn, ts)
        if orig is None or turn < orig[0]:
            orig = (turn, part)

    # 2) edges for this batch's turns against the merged state
    out = {k: [] for k in
           ("src_turn", "src_participant", "dst_turn", "dst_participant", "ts")}
    orig_turn, orig_part = orig
    for turn, part, ts in turns:
        if turn == orig_turn:
            continue  # the opener has no influencer
        for q, (q_turn, q_ts) in acts.items():
            if q == part:
                continue
            if q_ts < ts or q == orig_part:
                out["src_turn"].append(q_turn)
                out["src_participant"].append(q)
                out["dst_turn"].append(turn)
                out["dst_participant"].append(part)
                out["ts"].append(ts)

    state.update(
        (
            list(acts.keys()),
            [t for t, _ in acts.values()],
            [s for _, s in acts.values()],
            orig_turn,
            orig_part,
        )
    )

    n = len(out["ts"])
    yield pd.DataFrame(
        {
            "conv_id": [conv_id] * n,
            **out,
            "orig_turn": [orig_turn] * n,
        },
        columns=[f.name for f in OUT_SCHEMA.fields],
    )


def stream_derive_stateful(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    friendships: DataFrame | None = None,
) -> None:
    """Run the stateful-streaming derivation over a parquet directory
    with an ``availableNow`` trigger; edges land in ``output_dir`` as
    parquet via the exactly-once file sink.

    ``friendships``: optional ``(user, friend)`` candidate restriction —
    same contract as ``derive.derive_edge_turns`` and
    ``IncrementalDeriver`` (the reference's social-graph semi-join,
    ``tar.rs:355-381``), so the three derivation paths stay
    interchangeable (ADVICE r2). Applied as a stream-static broadcast
    left-semi join on the emitted edges: the restriction filters
    candidate (influencer, influencee) pairs AFTER state merge, exactly
    where the batch/incremental paths apply it, so outputs match."""
    from crgp_spark.schemas import TRANSCRIPTS

    reader = spark.readStream.schema(TRANSCRIPTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    turns = reader.parquet(input_path).select(
        "conv_id",
        "turn_idx",
        participant().alias("participant"),
        ts_micros("ts").alias("ts"),
    )
    edges = turns.groupBy("conv_id").applyInPandasWithState(
        _derive_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    if friendships is not None:
        fr = F.broadcast(friendships.select("user", "friend").distinct())
        edges = edges.join(
            fr,
            (edges["dst_participant"] == fr["user"])
            & (edges["src_participant"] == fr["friend"]),
            "left_semi",
        )
    q = (
        edges.writeStream.format("parquet")
        .option("path", output_dir)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(output_dir + "_ckpt"),
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def edges(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(output_dir)
