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
import shutil
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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
    def _commit_manifest(
        self, snap_id: int, visible: list[str], operation: str
    ) -> int:
        """Manifest then HEAD, each tmp+rename — HEAD is the only
        commit point (see module docstring)."""
        manifest = {
            "snapshot_id": snap_id,
            "parent": self.head(),
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
        return self._commit_manifest(snap_id, visible, operation)

    def append(self, df: DataFrame) -> int:
        """New snapshot = parent's data + ``df``. Returns snapshot id."""
        return self._commit(df, "append")

    def overwrite(self, df: DataFrame) -> int:
        """New snapshot containing ONLY ``df`` (prior data stays on disk
        for older snapshots — Iceberg overwrite semantics)."""
        return self._commit(df, "overwrite")

    def merge_upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key_cols: list[str],
        delete_where: str | Column | None = None,
    ) -> int:
        """The MERGE INTO verb: ``WHEN MATCHED THEN UPDATE, WHEN NOT
        MATCHED THEN INSERT``, plus — when ``delete_where`` is given —
        ``WHEN MATCHED AND <delete_where> THEN DELETE`` with the
        NOT-MATCHED insert guarded by ``NOT <delete_where>`` (the CDC
        tombstone-apply shape: a delete-marked row removes its target
        row if present and is never inserted).  New snapshot = every
        current row whose key is absent from ``updates`` (left-anti
        join on the keys) plus the non-tombstone updates.  Committed as
        an overwrite snapshot, so every earlier version stays
        time-travel readable — copy-on-write MERGE, the Iceberg v1
        semantics.

        Contract (enforced, ADVICE r3): keys must be unique and
        non-NULL within ``updates`` — duplicate keys would write
        duplicate rows, and NULL keys never match the anti-join, so
        both fail loudly with ValueError instead of corrupting the
        snapshot."""
        if not key_cols:
            raise ValueError("need at least one key column")
        current = self.read(spark)
        missing = [c for c in key_cols if c not in current.columns]
        if missing or sorted(current.columns) != sorted(updates.columns):
            raise ValueError(
                f"schema mismatch: table={current.columns} "
                f"updates={updates.columns} missing_keys={missing}"
            )
        # one metadata-sized aggregate validates both contract clauses
        chk = updates.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(*[F.col(k) for k in key_cols]).alias("nk"),
            F.sum(
                F.when(
                    F.greatest(*[F.col(k).isNull() for k in key_cols])
                    if len(key_cols) > 1
                    else F.col(key_cols[0]).isNull(),
                    1,
                ).otherwise(0)
            ).alias("nnull"),
        ).first()
        if chk["nnull"]:
            raise ValueError(
                f"merge_upsert: {chk['nnull']} update row(s) carry NULL "
                f"in key columns {key_cols}"
            )
        if chk["nk"] != chk["n"]:
            raise ValueError(
                f"merge_upsert: keys not unique within updates "
                f"({chk['n']} rows, {chk['nk']} distinct keys)"
            )
        kept = current.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        if delete_where is not None:
            cond = (
                F.expr(delete_where)
                if isinstance(delete_where, str)
                else delete_where
            )
            live = updates.filter(~cond)
            op = "merge_upsert_delete_overwrite"
        else:
            live = updates
            op = "merge_upsert_overwrite"
        return self._commit(kept.unionByName(live), op)

    def merge_cdc(
        self,
        spark: SparkSession,
        changes: DataFrame,
        key_cols: list[str],
        order_cols: list[str],
        op_col: str = "op",
    ) -> int:
        """MERGE INTO fed by a raw CDC changelog slice (Debezium/DLT
        apply-changes semantics): ``changes`` carries the full table
        payload plus ``op_col`` (``'U'`` upsert / ``'D'`` delete) and a
        per-key total order ``order_cols``.  The slice is reduced to its
        frontier (latest change per key — `diff.change_frontier`, which
        raises on ambiguous duplicate orders), then: matched U updates,
        matched D deletes, unmatched U inserts, unmatched D is a no-op.
        Committed copy-on-write like `merge_upsert`, so every earlier
        snapshot stays time-travel readable.

        NULL keys never match the anti-join and would silently
        duplicate — rejected loudly (same contract as `merge_upsert`)."""
        if not key_cols:
            raise ValueError("need at least one key column")
        current = self.read(spark)
        missing = [c for c in current.columns if c not in changes.columns]
        if missing:
            raise ValueError(
                f"changes missing table columns {missing} "
                f"(table={current.columns})"
            )
        from crgp_spark.operators.diff import change_frontier

        frontier = change_frontier(changes, key_cols, order_cols)
        null_key = frontier.select(key_cols[0]).filter(
            F.greatest(*[F.col(k).isNull() for k in key_cols])
            if len(key_cols) > 1
            else F.col(key_cols[0]).isNull()
        )
        if null_key.limit(1).count():
            raise ValueError(
                f"merge_cdc: NULL values in key columns {key_cols}"
            )
        kept = current.join(
            frontier.select(*key_cols), key_cols, "left_anti"
        )
        live = frontier.filter(F.col(op_col) == "U").select(*current.columns)
        return self._commit(kept.unionByName(live), "merge_cdc_overwrite")

    # -- read --------------------------------------------------------------
    def read(
        self,
        spark: SparkSession,
        as_of: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """The table as of snapshot ``as_of`` (default: HEAD) — the
        ``VERSION AS OF`` read path.

        ``merge_schema=True`` enables schema evolution (the Iceberg
        add-column semantics): snapshots appended with extra columns
        union into one widened schema, rows from older snapshots carry
        NULL in the new columns.  Off by default — the merged-footer
        scan costs one extra metadata pass, so pay it only on evolved
        tables."""
        head = self.head()
        if head is None:
            raise ValueError(f"snapshot table {self.path!r} is empty")
        snap_id = head if as_of is None else int(as_of)
        if snap_id > head or not os.path.exists(self._manifest_path(snap_id)):
            raise ValueError(
                f"snapshot {snap_id} does not exist (HEAD = {head})"
            )
        dirs = self._read_manifest(snap_id)["data_dirs"]
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*dirs)

    # -- maintenance ---------------------------------------------------------
    def expire_snapshots(self, keep_last: int = 5) -> dict:
        """Snapshot GC (VERDICT r3 #7): expire every snapshot older than
        the last ``keep_last``, then remove data directories no retained
        manifest references.  Deletion order is the Iceberg one —
        expired MANIFESTS first (after that, nothing visible points at
        the dying data), orphaned data dirs second — so a crash at any
        point leaves all retained snapshots fully readable; a crash
        between the two phases merely leaks orphan dirs the next expire
        sweep collects.  Returns ``{"expired": n, "data_dirs_removed":
        m, "retained": [...ids]}``."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        h = self.head()
        if h is None:
            return {"expired": 0, "data_dirs_removed": 0, "retained": []}
        cutoff = h - keep_last + 1
        expired = [
            i
            for i in range(cutoff)
            if os.path.exists(self._manifest_path(i))
        ]
        retained = [
            i
            for i in range(max(cutoff, 0), h + 1)
            if os.path.exists(self._manifest_path(i))
        ]
        referenced = set()
        for i in retained:
            referenced.update(self._read_manifest(i)["data_dirs"])
        for i in expired:
            os.remove(self._manifest_path(i))
        removed = 0
        data_root = os.path.join(self.path, "data")
        for name in sorted(os.listdir(data_root)):
            d = os.path.join(data_root, name)
            if d not in referenced:
                shutil.rmtree(d)
                removed += 1
        return {
            "expired": len(expired),
            "data_dirs_removed": removed,
            "retained": retained,
        }

    def rewrite_files(
        self, spark: SparkSession, target_bytes: int = 128 * 1024 * 1024
    ) -> int:
        """OPTIMIZE / small-file compaction (VERDICT r3 #6): apply
        ``operators/compaction.py::compaction_plan`` to the HEAD
        snapshot's physical parquet files and commit a new snapshot with
        IDENTICAL rows in (at most) plan-many files.  Time travel stays
        intact — prior snapshots keep their manifests and data dirs
        (``expire_snapshots`` reclaims them later).

        Execution: the plan is file METADATA (one row per parquet part
        file), so collecting it driver-side is O(files); each bin is
        then one read-coalesce-append job into the new snapshot's data
        dir — the per-bin loop the planner module documents. Returns
        the new snapshot id."""
        from crgp_spark.operators.compaction import compaction_plan

        head = self.head()
        if head is None:
            raise ValueError(f"snapshot table {self.path!r} is empty")
        meta = []
        for d in self._read_manifest(head)["data_dirs"]:
            for root, _dirs, names in os.walk(d):
                for n in names:
                    if n.endswith(".parquet"):
                        p = os.path.join(root, n)
                        meta.append((p, os.path.getsize(p)))
        if not meta:
            raise ValueError("HEAD snapshot has no parquet files")
        plan = compaction_plan(
            spark.createDataFrame(meta, "path string, size long"),
            id_col="path",
            size_col="size",
            target_bytes=target_bytes,
        )
        bins: dict[int, list[str]] = {}
        for r in plan.collect():  # metadata-sized (one row per file)
            bins.setdefault(r["bin"], []).append(r["path"])

        snap_id = head + 1
        data_dir = os.path.join(self.path, "data", f"snap_{snap_id:08d}")
        for paths in bins.values():
            spark.read.parquet(*paths).coalesce(1).write.mode(
                "append"
            ).parquet(data_dir)
        return self._commit_manifest(snap_id, [data_dir], "rewrite")


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
