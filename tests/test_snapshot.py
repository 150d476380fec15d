"""Snapshot-table (Iceberg shim) time travel: write 3 epochs, read
as-of each; overwrite isolation; torn commits invisible."""

from __future__ import annotations

import os

from crgp_spark.sources.snapshot import SnapshotTable, read_table


def _df(spark, epoch: int, n: int):
    return spark.range(n).selectExpr(
        "id AS edge_id", f"{epoch} AS epoch"
    )


def test_time_travel_three_epochs(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "edges"))
    ids = [t.append(_df(spark, e, 10 * (e + 1))) for e in range(3)]
    assert ids == [0, 1, 2]
    # as-of each snapshot: cumulative append semantics
    assert read_table(spark, t.path, as_of=0).count() == 10
    assert read_table(spark, t.path, as_of=1).count() == 30
    assert read_table(spark, t.path, as_of=2).count() == 60
    # default read = HEAD
    assert read_table(spark, t.path).count() == 60
    assert {r["epoch"] for r in read_table(spark, t.path, as_of=1).collect()} == {0, 1}
    assert [s["operation"] for s in t.snapshots()] == ["append"] * 3


def test_overwrite_keeps_old_snapshots_readable(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    t.append(_df(spark, 1, 5))
    sid = t.overwrite(_df(spark, 2, 3))
    assert sid == 2
    assert read_table(spark, t.path).count() == 3  # HEAD sees only new
    assert read_table(spark, t.path, as_of=1).count() == 10  # time travel intact


def test_torn_commit_is_invisible(spark, tmp_path):
    """Data + manifest written but HEAD not advanced (crash between the
    two renames) — readers must keep serving the previous snapshot and
    reject the uncommitted id."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 4))

    # simulate the torn commit: manifest for snapshot 1 exists, HEAD=0
    head = t._head_path()
    with open(head) as f:
        saved = f.read()
    t.append(_df(spark, 1, 4))
    with open(head, "w") as f:
        f.write(saved)

    assert t.head() == 0
    assert read_table(spark, t.path).count() == 4
    assert len(t.snapshots()) == 1
    import pytest

    with pytest.raises(ValueError, match="does not exist"):
        read_table(spark, t.path, as_of=1)

    # the next commit replaces the orphan cleanly
    t2 = SnapshotTable(t.path)
    sid = t2.append(_df(spark, 9, 2))
    assert sid == 1
    assert read_table(spark, t.path, as_of=1).count() == 6


def test_empty_table_raises(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="empty"):
        read_table(spark, str(tmp_path / "nope"))


def test_merge_upsert(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "dim"))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k: long, v: string"
    )
    t.overwrite(base)
    updates = spark.createDataFrame(
        [(2, "B"), (4, "d")], "k: long, v: string"
    )
    sid = t.merge_upsert(spark, updates, ["k"])
    got = {
        r["k"]: r["v"] for r in read_table(spark, t.path).collect()
    }
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}  # update + insert
    # time travel: the pre-merge version is intact
    pre = {r["k"]: r["v"] for r in read_table(spark, t.path, as_of=sid - 1).collect()}
    assert pre == {1: "a", 2: "b", 3: "c"}
    # a second merge composes
    t.merge_upsert(
        spark, spark.createDataFrame([(1, "A")], "k: long, v: string"), ["k"]
    )
    assert read_table(spark, t.path).where(F.col("k") == 1).collect()[0]["v"] == "A"
    # schema mismatch and empty keys refused
    with pytest.raises(ValueError):
        t.merge_upsert(spark, updates.select("k"), ["k"])
    with pytest.raises(ValueError):
        t.merge_upsert(spark, updates, [])


def _count_parquet_files(dirs):
    n = 0
    for d in dirs:
        for root, _x, names in os.walk(d):
            n += sum(1 for f in names if f.endswith(".parquet"))
    return n


def test_merge_upsert_rejects_duplicate_and_null_keys(spark, tmp_path):
    import pytest

    t = SnapshotTable(str(tmp_path / "m"))
    t.overwrite(_df(spark, 0, 5))
    dup = spark.createDataFrame(
        [(1, 9), (1, 9)], "edge_id long, epoch long"
    )
    with pytest.raises(ValueError, match="not unique"):
        t.merge_upsert(spark, dup, ["edge_id"])
    nul = spark.createDataFrame([(None, 9)], "edge_id long, epoch long")
    with pytest.raises(ValueError, match="NULL"):
        t.merge_upsert(spark, nul, ["edge_id"])
    # contract violations must not have committed anything
    assert t.head() == 0


def test_merge_delete_clause(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "d"))
    t.overwrite(_df(spark, 0, 6))  # edge_id 0..5, epoch 0
    ups = spark.createDataFrame(
        [
            (1, 7),    # matched update
            (2, -1),   # matched tombstone -> deleted
            (99, 7),   # unmatched insert
            (98, -1),  # unmatched tombstone -> must NOT be inserted
        ],
        "edge_id long, epoch long",
    )
    t.merge_upsert(spark, ups, ["edge_id"], delete_where="epoch < 0")
    got = {
        r.edge_id: r.epoch for r in read_table(spark, t.path).collect()
    }
    assert got == {0: 0, 1: 7, 3: 0, 4: 0, 5: 0, 99: 7}
    # pre-merge snapshot still time-travel readable
    assert read_table(spark, t.path, as_of=0).count() == 6


def test_rewrite_files_compacts_without_changing_data(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "rw"))
    for e in range(6):
        t.append(_df(spark, e, 20).repartition(4))
    before = read_table(spark, t.path)
    before_rows = sorted((r.edge_id, r.epoch) for r in before.collect())
    n_before = _count_parquet_files(t._read_manifest(t.head())["data_dirs"])
    sid = t.rewrite_files(spark, target_bytes=64 * 1024 * 1024)
    assert sid == 6
    after = read_table(spark, t.path)
    assert sorted((r.edge_id, r.epoch) for r in after.collect()) == before_rows
    n_after = _count_parquet_files(t._read_manifest(sid)["data_dirs"])
    assert n_after < n_before
    # every pre-rewrite snapshot still readable
    assert read_table(spark, t.path, as_of=2).count() == 60
    assert [s["operation"] for s in t.snapshots()][-1] == "rewrite"


def test_expire_snapshots_gc(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "gc"))
    for e in range(5):
        t.append(_df(spark, e, 10))
    t.rewrite_files(spark)  # snap 5: one dir referencing nothing older
    stats = t.expire_snapshots(keep_last=1)
    assert stats["expired"] == 5
    assert stats["retained"] == [5]
    assert stats["data_dirs_removed"] == 5  # snaps 0-4 dirs orphaned
    assert read_table(spark, t.path).count() == 50
    import pytest

    with pytest.raises(ValueError):
        read_table(spark, t.path, as_of=2)


def test_expire_keeps_shared_dirs(spark, tmp_path):
    """Append manifests share older data dirs — expiring must keep any
    dir a RETAINED manifest still references."""
    t = SnapshotTable(str(tmp_path / "sh"))
    for e in range(4):
        t.append(_df(spark, e, 10))
    stats = t.expire_snapshots(keep_last=2)  # keep snaps 2,3
    assert stats["expired"] == 2
    # snaps 2 and 3 reference dirs 0..2 / 0..3 -> nothing removable
    assert stats["data_dirs_removed"] == 0
    assert read_table(spark, t.path, as_of=2).count() == 30
    assert read_table(spark, t.path).count() == 40


def test_expire_crash_between_phases_is_safe(spark, tmp_path, monkeypatch):
    """Crash after manifests are expired but before orphan dirs are
    removed: every retained snapshot still reads; a re-run completes
    the GC."""
    import shutil as _sh

    t = SnapshotTable(str(tmp_path / "cr"))
    for e in range(4):
        t.append(_df(spark, e, 10))
    t.rewrite_files(spark)  # snap 4, self-contained

    calls = {"n": 0}
    real = _sh.rmtree

    def boom(path, *a, **k):
        calls["n"] += 1
        raise OSError("simulated crash before data GC")

    import crgp_spark.sources.snapshot as snapmod

    monkeypatch.setattr(snapmod.shutil, "rmtree", boom)
    try:
        t.expire_snapshots(keep_last=1)
    except OSError:
        pass
    assert calls["n"] == 1
    monkeypatch.setattr(snapmod.shutil, "rmtree", real)
    # retained HEAD unaffected by the torn GC
    assert read_table(spark, t.path).count() == 40
    stats = t.expire_snapshots(keep_last=1)  # re-run completes
    assert stats["data_dirs_removed"] >= 1
    assert read_table(spark, t.path).count() == 40


def test_schema_evolution_merged_read(spark, tmp_path):
    """Appending a snapshot with a NEW column widens the merged read;
    old rows NULL-backfill, and the pre-evolution snapshot still reads
    with its original schema (time travel unaffected)."""
    from crgp_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.overwrite(spark.createDataFrame([(1, 10), (2, 20)], "k: long, v: long"))
    t.append(
        spark.createDataFrame([(3, 30, "gold")], "k: long, v: long, tier: string")
    )
    merged = t.read(spark, merge_schema=True)
    assert set(merged.columns) == {"k", "v", "tier"}
    rows = {r["k"]: (r["v"], r["tier"]) for r in merged.collect()}
    assert rows == {1: (10, None), 2: (20, None), 3: (30, "gold")}
    old = t.read(spark, as_of=0)
    assert set(old.columns) == {"k", "v"}
    assert old.count() == 2
