"""stream_merge_cdc: per-epoch MERGE commits == one-shot batch
apply_changes; every intermediate epoch stays time-travel readable and
equals the prefix apply."""

from __future__ import annotations

import pytest

from crgp_spark.operators.diff import apply_changes
from crgp_spark.sources.snapshot import SnapshotTable
from crgp_spark.streaming.merge import stream_merge_cdc
from crgp_spark.streaming.scd import write_time_chunks

BASE_SCHEMA = "k: long, name: string, v: long"
CH_SCHEMA = "k: long, name: string, v: long, op: string, us: long, event_id: long"

BASE = [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)]
# 8 changes over 4 chunks of 2; key 1 touched in chunks 0 and 3, key 5
# inserted then deleted across chunks — per-epoch merges must compose.
CHANGES = [
    (1, "a2", 15, "U", 10, 1),
    (5, "e", 7, "U", 20, 2),
    (3, "c", 0, "D", 30, 3),
    (2, "b2", 21, "U", 40, 4),
    (5, "e2", 9, "U", 50, 5),
    (9, "zz", 0, "D", 60, 6),   # delete of an absent key: no-op
    (1, "a3", 11, "U", 70, 7),
    (5, "e", 0, "D", 80, 8),    # the chunk-0 insert dies in chunk 3
]


def _rows(df):
    return sorted(map(tuple, df.select("k", "name", "v").collect()))


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory):
    base = spark.createDataFrame(BASE, BASE_SCHEMA)
    changes = spark.createDataFrame(CHANGES, CH_SCHEMA)
    feed = str(tmp_path_factory.mktemp("merge_feed"))
    write_time_chunks(changes, feed, n_chunks=4)
    t = SnapshotTable(str(tmp_path_factory.mktemp("merge_tbl")))
    t.overwrite(base)
    got = stream_merge_cdc(
        spark, t, feed, key_cols=["k"], order_cols=["us", "event_id"]
    )
    return t, got, base, changes


def test_stream_equals_batch_apply(spark, merged):
    t, got, base, changes = merged
    want = apply_changes(base, changes, ["k"], ["us", "event_id"])
    assert _rows(got) == _rows(want)
    assert _rows(got) == [(1, "a3", 11), (2, "b2", 21), (4, "d", 40)]


def test_every_epoch_time_travel_readable(spark, merged):
    """Snapshot 1+k == apply_changes(base, first k chunks) — the
    snapshot log is a per-epoch CDC audit trail (snapshot 0 = base)."""
    t, _got, base, changes = merged
    assert t.head() == 4  # base overwrite + 4 merge commits
    assert _rows(t.read(spark, as_of=0)) == _rows(base)
    rows = sorted(CHANGES, key=lambda r: (r[4], r[5]))
    for k in range(1, 5):
        prefix = spark.createDataFrame(rows[: 2 * k], CH_SCHEMA)
        want = apply_changes(base, prefix, ["k"], ["us", "event_id"])
        assert _rows(t.read(spark, as_of=k)) == _rows(want), f"epoch {k}"


def test_merge_cdc_rejects_null_keys(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.overwrite(spark.createDataFrame(BASE, BASE_SCHEMA))
    bad = spark.createDataFrame(
        [(None, "x", 1, "U", 1, 1)], CH_SCHEMA
    )
    with pytest.raises(ValueError, match="NULL"):
        t.merge_cdc(spark, bad, ["k"], ["us", "event_id"])


def test_merge_cdc_rejects_missing_payload_columns(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.overwrite(spark.createDataFrame(BASE, BASE_SCHEMA))
    bad = spark.createDataFrame(
        [(1, "U", 1, 1)], "k: long, op: string, us: long, event_id: long"
    )
    with pytest.raises(ValueError, match="missing table columns"):
        t.merge_cdc(spark, bad, ["k"], ["us", "event_id"])


def test_merge_cdc_intra_batch_frontier(spark, tmp_path):
    """Multiple changes to one key inside a single merge slice reduce
    to the latest; ambiguous duplicate orders raise."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.overwrite(spark.createDataFrame(BASE, BASE_SCHEMA))
    slice_ = spark.createDataFrame(
        [(1, "x", 1, "U", 1, 1), (1, "y", 2, "U", 2, 2)], CH_SCHEMA
    )
    t.merge_cdc(spark, slice_, ["k"], ["us", "event_id"])
    assert (1, "y", 2) in _rows(t.read(spark))
    dup = spark.createDataFrame(
        [(2, "x", 1, "U", 5, 5), (2, "y", 2, "D", 5, 5)], CH_SCHEMA
    )
    with pytest.raises(ValueError, match="ambiguous"):
        t.merge_cdc(spark, dup, ["k"], ["us", "event_id"])
