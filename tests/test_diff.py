from __future__ import annotations

import pytest

from crgp_spark.operators.diff import table_diff


def _old(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", 30.0),
            (4, None, 40.0),
        ],
        "k: long, s: string, x: double",
    )


def _new(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged -> omitted
            (2, "B", 20.0),    # changed
            (4, "", 40.0),     # NULL -> "" is a change
            (5, "e", 50.0),    # added
        ],
        "k: long, s: string, x: double",
    )


def test_diff_statuses(spark):
    got = {
        r["k"]: r["status"]
        for r in table_diff(_old(spark), _new(spark), ["k"]).collect()
    }
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_compare_subset(spark):
    # comparing only x: key 2 and 4 become unchanged
    got = {
        r["k"]: r["status"]
        for r in table_diff(
            _old(spark), _new(spark), ["k"], compare_cols=["x"]
        ).collect()
    }
    assert got == {3: "removed", 5: "added"}


def test_validation(spark):
    with pytest.raises(ValueError):
        table_diff(_old(spark), _new(spark), [])
    with pytest.raises(ValueError):
        table_diff(
            _old(spark).select("k"), _new(spark).select("k"), ["k"]
        )


class TestApplyChanges:
    def _base(self, spark):
        return spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "k long, name string, v long",
        )

    def test_upsert_delete_insert_untouched(self, spark):
        from crgp_spark.operators.diff import apply_changes

        # k=1 updated twice (latest wins), k=2 deleted, k=9 inserted,
        # k=3 untouched
        ch = spark.createDataFrame(
            [
                (1, "a1", 11, "U", 1, 0),
                (1, "a2", 12, "U", 2, 0),
                (2, "b", 0, "D", 1, 0),
                (9, "new", 90, "U", 1, 0),
            ],
            "k long, name string, v long, op string, ver long, seq long",
        )
        out = apply_changes(
            self._base(spark), ch, key_cols=["k"], order_cols=["ver", "seq"]
        )
        rows = sorted(map(tuple, out.collect()))
        assert rows == [(1, "a2", 12), (3, "c", 30), (9, "new", 90)]

    def test_delete_then_reinsert_latest_wins(self, spark):
        from crgp_spark.operators.diff import apply_changes

        ch = spark.createDataFrame(
            [(1, "x", 0, "D", 1, 0), (1, "back", 99, "U", 1, 1)],
            "k long, name string, v long, op string, ver long, seq long",
        )
        out = apply_changes(
            self._base(spark), ch, key_cols=["k"], order_cols=["ver", "seq"]
        )
        rows = sorted(map(tuple, out.collect()))
        assert (1, "back", 99) in rows and len(rows) == 3

    def test_ambiguous_ordering_raises(self, spark):
        from crgp_spark.operators.diff import apply_changes

        ch = spark.createDataFrame(
            [(1, "p", 1, "U", 5, 0), (1, "q", 2, "U", 5, 0)],
            "k long, name string, v long, op string, ver long, seq long",
        )
        with pytest.raises(ValueError, match="ambiguous changelog"):
            apply_changes(
                self._base(spark), ch,
                key_cols=["k"], order_cols=["ver", "seq"],
            )

    def test_validates_empty_specs(self, spark):
        from crgp_spark.operators.diff import apply_changes

        with pytest.raises(ValueError):
            apply_changes(
                self._base(spark), self._base(spark),
                key_cols=[], order_cols=["v"],
            )
