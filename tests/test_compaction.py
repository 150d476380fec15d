from __future__ import annotations

import pytest

from crgp_spark.operators.compaction import compaction_plan


def _files(spark, rows):
    return spark.createDataFrame(rows, "p: string, f: string, sz: long")


def test_packing(spark):
    files = _files(
        spark,
        [
            ("a", "f1", 70),
            ("a", "f2", 50),
            ("a", "f3", 40),
            ("a", "f4", 30),
            ("a", "f5", 10),
        ],
    )
    got = {
        r["f"]: (r["bin"], r["bin_bytes"])
        for r in compaction_plan(files, "f", "sz", 100, "p").collect()
    }
    # largest-first cumsum: 70(prior 0->bin0), 50(prior 70->bin0),
    # 40(prior 120->bin1), 30(prior 160->bin1), 10(prior 190->bin1)
    assert got["f1"] == (0, 120)
    assert got["f2"] == (0, 120)
    assert got["f3"] == (1, 80)
    assert got["f4"] == (1, 80)
    assert got["f5"] == (1, 80)


def test_oversized_file_isolated_and_partitions_independent(spark):
    files = _files(
        spark,
        [("a", "big", 500), ("a", "s1", 10), ("b", "s2", 10)],
    )
    got = {
        (r["p"], r["f"]): r["bin"]
        for r in compaction_plan(files, "f", "sz", 100, "p").collect()
    }
    assert got[("a", "big")] == 0
    assert got[("a", "s1")] == 5  # prior 500 div 100
    assert got[("b", "s2")] == 0


def test_zero_size_dropped_and_validation(spark):
    files = _files(spark, [("a", "f1", 0), ("a", "f2", 10)])
    assert compaction_plan(files, "f", "sz", 100, "p").count() == 1
    with pytest.raises(ValueError):
        compaction_plan(files, "f", "sz", 0, "p")
