"""Incremental view maintenance (crgp_spark/operators/ivm.py).

The contract: `maintain_rollup(base, changes, ...)` equals
`rollup_view(apply_changes(base, changes, ...))` — including group
migration (an update moving a key between groups), deletes emptying a
group entirely, and inserts creating a new group.
"""

from __future__ import annotations

import pytest

from crgp_spark.operators.diff import apply_changes
from crgp_spark.operators.ivm import maintain_rollup, rollup_view

BASE_SCHEMA = "k: long, grp: string, v: long"
CH_SCHEMA = "k: long, grp: string, v: long, op: string, ver: long"


def _check(spark, base_rows, change_rows):
    base = spark.createDataFrame(base_rows, BASE_SCHEMA)
    changes = spark.createDataFrame(change_rows, CH_SCHEMA)
    got = sorted(
        (r["grp"], r["n"], r["total"])
        for r in maintain_rollup(
            base, changes, ["k"], ["ver"], ["grp"], "v"
        ).collect()
    )
    applied = apply_changes(base, changes, ["k"], ["ver"])
    want = sorted(
        (r["grp"], r["n"], r["total"])
        for r in rollup_view(applied, ["grp"], "v").collect()
    )
    assert got == want
    return got


def test_update_delete_insert_mix(spark):
    base = [(1, "a", 10), (2, "a", 20), (3, "b", 30)]
    changes = [
        (2, "a", 25, "U", 1),   # in-place update
        (3, "b", 0, "D", 1),    # delete empties group b
        (4, "c", 7, "U", 1),    # insert creates group c
    ]
    got = _check(spark, base, changes)
    assert got == [("a", 1 + 1, 10 + 25), ("c", 1, 7)]


def test_group_migration(spark):
    base = [(1, "a", 10), (2, "b", 5)]
    # key 1 moves a -> b: retraction hits a (now empty), insertion b
    got = _check(spark, base, [(1, "b", 11, "U", 1)])
    assert got == [("b", 2, 16)]


def test_latest_change_wins(spark):
    base = [(1, "a", 10)]
    changes = [(1, "a", 99, "U", 1), (1, "a", 0, "D", 2)]
    assert _check(spark, base, changes) == []


def test_no_changes_is_identity(spark):
    base = [(1, "a", 10), (2, "b", 5)]
    assert _check(spark, base, []) == [("a", 1, 10), ("b", 1, 5)]


def test_delete_absent_key_is_noop(spark):
    got = _check(spark, [(1, "a", 10)], [(9, "z", 0, "D", 1)])
    assert got == [("a", 1, 10)]


def test_precomputed_view_is_used(spark):
    base = spark.createDataFrame([(1, "a", 10)], BASE_SCHEMA)
    changes = spark.createDataFrame([(2, "a", 5, "U", 1)], CH_SCHEMA)
    view = rollup_view(base, ["grp"], "v")
    out = maintain_rollup(
        base, changes, ["k"], ["ver"], ["grp"], "v", base_agg=view
    ).collect()
    assert [(r["grp"], r["n"], r["total"]) for r in out] == [("a", 2, 15)]


def test_ambiguous_changelog_raises(spark):
    base = spark.createDataFrame([(1, "a", 10)], BASE_SCHEMA)
    changes = spark.createDataFrame(
        [(1, "a", 5, "U", 1), (1, "a", 6, "U", 1)], CH_SCHEMA
    )
    with pytest.raises(ValueError, match="ambiguous"):
        maintain_rollup(base, changes, ["k"], ["ver"], ["grp"], "v").collect()
