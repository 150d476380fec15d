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
