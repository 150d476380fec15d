"""stream_maintain_rollup: the streamed delta-propagation view equals
the one-shot batch recompute; per-epoch retraction reads the evolving
snapshot (not the original base) across micro-batch boundaries."""

from __future__ import annotations

import pytest

from crgp_spark.operators.diff import apply_changes
from crgp_spark.operators.ivm import rollup_view
from crgp_spark.streaming.ivm import RollupMaintainer, stream_maintain_rollup
from crgp_spark.streaming.scd import write_time_chunks

BASE_SCHEMA = "k: long, grp: string, v: long"
CH_SCHEMA = "k: long, grp: string, v: long, op: string, us: long, event_id: long"

BASE = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)]
# 8 changes over 4 chunks of 2.  Key 1 is touched in chunk 0 AND
# chunk 3 (and migrates groups): the second retraction must see the
# value chunk 0 left in the snapshot (15), not the base value (10) —
# the cross-epoch property a single-batch test cannot exercise.
CHANGES = [
    (1, "a", 15, "U", 10, 1),   # chunk 0: in-place update
    (5, "d", 7, "U", 20, 2),    # chunk 0: insert, new group
    (3, "b", 0, "D", 30, 3),    # chunk 1: delete empties group b
    (2, "c", 21, "U", 40, 4),   # chunk 1: migration a -> c
    (5, "d", 9, "U", 50, 5),    # chunk 2: update the chunk-0 insert
    (4, "c", 0, "D", 60, 6),    # chunk 2: delete
    (1, "b", 11, "U", 70, 7),   # chunk 3: migrate a -> b (retract 15)
    (6, "a", 3, "U", 80, 8),    # chunk 3: insert
]


def _rows(df):
    return sorted((r["grp"], r["n"], r["total"]) for r in df.collect())


@pytest.fixture(scope="module")
def views(spark, tmp_path_factory):
    base = spark.createDataFrame(BASE, BASE_SCHEMA)
    changes = spark.createDataFrame(CHANGES, CH_SCHEMA)
    work = str(tmp_path_factory.mktemp("ivm_stream"))
    write_time_chunks(changes, work, n_chunks=4)
    got = stream_maintain_rollup(
        spark, base, work,
        key_cols=["k"], order_cols=["us", "event_id"],
        group_cols=["grp"], val_col="v",
    )
    want = rollup_view(
        apply_changes(base, changes, ["k"], ["us", "event_id"]),
        ["grp"], "v",
    )
    return got, want


def test_stream_equals_batch_recompute(spark, views):
    got, want = views
    assert _rows(got) == _rows(want)
    # snapshot after all changes: 1->(b,11), 2->(c,21), 5->(d,9), 6->(a,3)
    assert _rows(got) == [("a", 1, 3), ("b", 1, 11), ("c", 1, 21), ("d", 1, 9)]


def test_epochs_actually_chunked(spark, tmp_path_factory):
    """The drain runs one delta step per file — state genuinely crosses
    epoch boundaries (4 chunks -> 4 epochs with maxFilesPerTrigger=1)."""
    base = spark.createDataFrame(BASE, BASE_SCHEMA)
    changes = spark.createDataFrame(CHANGES, CH_SCHEMA)
    work = str(tmp_path_factory.mktemp("ivm_epochs"))
    write_time_chunks(changes, work, n_chunks=4)

    import uuid

    m = RollupMaintainer(base, ["k"], ["us", "event_id"], ["grp"], "v")
    schema = spark.read.parquet(work).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(work)
        .writeStream.foreachBatch(m.process_batch)
        .queryName(f"ivm_test_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert m.epochs == 4
    assert _rows(m.view) == [
        ("a", 1, 3), ("b", 1, 11), ("c", 1, 21), ("d", 1, 9)
    ]


def test_single_chunk_degenerates_to_batch(spark, tmp_path_factory):
    base = spark.createDataFrame(BASE, BASE_SCHEMA)
    changes = spark.createDataFrame(CHANGES, CH_SCHEMA)
    work = str(tmp_path_factory.mktemp("ivm_one"))
    write_time_chunks(changes, work, n_chunks=1)
    got = stream_maintain_rollup(
        spark, base, work,
        key_cols=["k"], order_cols=["us", "event_id"],
        group_cols=["grp"], val_col="v",
        max_files_per_trigger=None,
    )
    assert _rows(got) == [("a", 1, 3), ("b", 1, 11), ("c", 1, 21), ("d", 1, 9)]
