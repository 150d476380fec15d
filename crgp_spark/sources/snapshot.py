"""Snapshot-versioned parquet tables with time travel — the Iceberg
catalog shim made a real, tested capability (SURVEY.md R4; VERDICT r2
ask #7: no Iceberg runtime jar ships in this sandbox, so the snapshot /
time-travel SEMANTICS are implemented over plain parquet with the same
commit discipline the engine's checkpoints use, ``plans/checkpoint.py``).

Layout, per table::

    {path}/data/snap_00000003/   parquet data files added by snapshot 3
    {path}/snapshots/snap_00000003.json
        {"snapshot_id": 3, "parent": 2, "operation": "append",
         "data_dirs": [...all dirs visible at snapshot 3...],
         "created_ms": ...}
    {path}/HEAD.json             {"snapshot_id": 3}   <- commit point

Commit protocol (single writer, like an Iceberg table with one
committer): data files first, then the snapshot manifest (tmp+rename),
then HEAD (tmp+rename) — HEAD is the only commit point, so a crash
anywhere earlier leaves the previous snapshot intact and the orphaned
data invisible. ``read(as_of=N)`` serves any COMMITTED snapshot id
(<= HEAD): each manifest carries the full list of data dirs visible at
that snapshot, so time travel is one manifest read + one parquet scan —
no log replay.

At 100 TB this is exactly the Iceberg read path shape: pruning happens
at the parquet level (partition dirs / row groups), and a real Iceberg
deployment swaps this module for ``spark.read.format("iceberg")`` with
``VERSION AS OF`` — the engine's writers only ever call append /
overwrite / read.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """Append/overwrite parquet table with snapshot isolation and
    id-based time travel."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # -- commit-log helpers ------------------------------------------------
    def _head_path(self) -> str:
        return os.path.join(self.path, "HEAD.json")

    def head(self) -> int | None:
        """Id of the latest COMMITTED snapshot, or None for an empty
        table."""
        try:
            with open(self._head_path()) as f:
                return int(json.load(f)["snapshot_id"])
        except FileNotFoundError:
            return None

    def _manifest_path(self, snap_id: int) -> str:
        return os.path.join(
            self.path, "snapshots", f"snap_{snap_id:08d}.json"
        )

    def _read_manifest(self, snap_id: int) -> dict:
        with open(self._manifest_path(snap_id)) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """Committed snapshot manifests, oldest first. Manifests beyond
        HEAD (a crash between manifest and HEAD rename) are invisible —
        HEAD is the commit point."""
        h = self.head()
        if h is None:
            return []
        return [
            self._read_manifest(i)
            for i in range(h + 1)
            if os.path.exists(self._manifest_path(i))
        ]

    # -- write -------------------------------------------------------------
    def _commit(self, df: DataFrame, operation: str) -> int:
        head = self.head()
        snap_id = 0 if head is None else head + 1
        data_dir = os.path.join(self.path, "data", f"snap_{snap_id:08d}")
        df.write.mode("overwrite").parquet(data_dir)

        if operation == "append" and head is not None:
            visible = list(self._read_manifest(head)["data_dirs"])
        else:
            visible = []
        visible.append(data_dir)

        manifest = {
            "snapshot_id": snap_id,
            "parent": head,
            "operation": operation,
            "data_dirs": visible,
            "created_ms": int(time.time() * 1000),
        }
        tmp = self._manifest_path(snap_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(snap_id))

        tmp = self._head_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": snap_id}, f)
        os.replace(tmp, self._head_path())  # <- the commit
        return snap_id

    def append(self, df: DataFrame) -> int:
        """New snapshot = parent's data + ``df``. Returns snapshot id."""
        return self._commit(df, "append")

    def overwrite(self, df: DataFrame) -> int:
        """New snapshot containing ONLY ``df`` (prior data stays on disk
        for older snapshots — Iceberg overwrite semantics)."""
        return self._commit(df, "overwrite")

    def merge_upsert(
        self, spark: SparkSession, updates: DataFrame, key_cols: list[str]
    ) -> int:
        """The MERGE INTO verb (``WHEN MATCHED THEN UPDATE, WHEN NOT
        MATCHED THEN INSERT``): new snapshot = ``updates`` plus every
        current row whose key is absent from ``updates`` (left-anti
        join on the keys).  Committed as an overwrite snapshot, so
        every earlier version stays time-travel readable — copy-on-
        write MERGE, the Iceberg v1 semantics.  Keys must be unique
        within ``updates`` (dimension contract)."""
        if not key_cols:
            raise ValueError("need at least one key column")
        current = self.read(spark)
        missing = [c for c in key_cols if c not in current.columns]
        if missing or sorted(current.columns) != sorted(updates.columns):
            raise ValueError(
                f"schema mismatch: table={current.columns} "
                f"updates={updates.columns} missing_keys={missing}"
            )
        kept = current.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        return self._commit(
            kept.unionByName(updates), "merge_upsert_overwrite"
        )

    # -- read --------------------------------------------------------------
    def read(self, spark: SparkSession, as_of: int | None = None) -> DataFrame:
        """The table as of snapshot ``as_of`` (default: HEAD) — the
        ``VERSION AS OF`` read path."""
        head = self.head()
        if head is None:
            raise ValueError(f"snapshot table {self.path!r} is empty")
        snap_id = head if as_of is None else int(as_of)
        if snap_id > head or not os.path.exists(self._manifest_path(snap_id)):
            raise ValueError(
                f"snapshot {snap_id} does not exist (HEAD = {head})"
            )
        dirs = self._read_manifest(snap_id)["data_dirs"]
        return spark.read.parquet(*dirs)


def read_table(
    spark: SparkSession, path: str, as_of: int | None = None
) -> DataFrame:
    """Convenience: time-travel read of a :class:`SnapshotTable`."""
    return SnapshotTable(path).read(spark, as_of=as_of)


def write_edges_snapshot(
    edges: DataFrame, path: str, mode: str = "append"
) -> int:
    """Edge-table writer over the snapshot log (the Iceberg-shim
    counterpart of ``sink.write_edges``). Returns the snapshot id."""
    t = SnapshotTable(path)
    return t.append(edges) if mode == "append" else t.overwrite(edges)
