"""Zone maps + data-skipping scans (crgp_spark/sources/zonemaps.py).

The contract under test: pruning changes which FILES are opened, never
the result — a skipping scan over a clustered layout must (a) read a
strict subset of the files and (b) return exactly the rows the plain
filter returns, including when file ranges overlap (conservative
pruning + exact residual filter).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crgp_spark.sources.zonemaps import skipping_scan, zone_maps


def _write_clustered(spark, path: str, n: int = 1000, parts: int = 10):
    (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("v"),
        )
        .repartitionByRange(parts, "k")
        .sortWithinPartitions("k")
        .write.parquet(path)
    )


def test_zone_maps_cover_all_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path)
    m = zone_maps(spark, path, "k").collect()
    assert sum(r["n_rows"] for r in m) == 1000
    assert min(r["cmin"] for r in m) == 0
    assert max(r["cmax"] for r in m) == 999
    # clustered write => disjoint per-file ranges
    spans = sorted((r["cmin"], r["cmax"]) for r in m)
    for (_, hi0), (lo1, _) in zip(spans, spans[1:]):
        assert hi0 < lo1


def test_skipping_scan_prunes_files_and_is_exact(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path)
    total_files = zone_maps(spark, path, "k").count()
    got = skipping_scan(spark, path, "k", 200, 349)
    # strict subset of files opened...
    assert 0 < len(got.inputFiles()) < total_files
    # ...identical rows to the plain filter
    want = (
        spark.read.parquet(path)
        .filter((F.col("k") >= 200) & (F.col("k") <= 349))
    )
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in want.collect()
    )


def test_overlapping_zones_stay_exact(spark, tmp_path):
    # unclustered layout: every file spans ~the whole key range, so
    # pruning keeps everything — the residual filter must still be exact
    path = str(tmp_path / "t")
    (
        spark.range(1000)
        .select(F.col("id").alias("k"))
        .repartition(8)  # round-robin: overlapping file ranges
        .write.parquet(path)
    )
    got = skipping_scan(spark, path, "k", 100, 199)
    assert sorted(r["k"] for r in got.collect()) == list(range(100, 200))


def test_interval_outside_all_zones_is_empty(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path)
    got = skipping_scan(spark, path, "k", 5000, 6000)
    assert got.count() == 0
    # schema must survive the empty-prune branch
    assert [f.name for f in got.schema.fields] == ["k", "v"]


def test_precomputed_maps_match_recompute(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path)
    maps = zone_maps(spark, path, "k")
    a = sorted(r["k"] for r in skipping_scan(spark, path, "k", 0, 99).collect())
    b = sorted(
        r["k"]
        for r in skipping_scan(spark, path, "k", 0, 99, maps=maps).collect()
    )
    assert a == b == list(range(100))


def test_bad_interval_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path, n=10, parts=1)
    with pytest.raises(ValueError):
        skipping_scan(spark, path, "k", 5, 4)
