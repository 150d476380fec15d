from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crgp_spark.config import EngineConfig
from crgp_spark.operators.pack import pack_csr, placement, salted, unpack_csr
from tests.oracles import random_edges


@pytest.fixture(scope="module")
def edges_df(spark):
    pdf = random_edges(300, 3000, seed=11, power_law=True)
    return spark.createDataFrame(pdf).persist()


def test_pack_roundtrip(spark, edges_df, tmp_path):
    cfg = EngineConfig(graph_partitions=8, hub_degree_threshold=20, max_salt=4)
    stats = pack_csr(edges_df, cfg, str(tmp_path / "g"))
    assert stats["n_edges"] == edges_df.count()
    back = unpack_csr(spark, str(tmp_path / "g"))
    orig = {(r.src, r.dst) for r in edges_df.collect()}
    got = {(r.src, r.dst) for r in back.collect()}
    assert got == orig


def test_salting_splits_hubs(spark, edges_df):
    cfg = EngineConfig(graph_partitions=8, hub_degree_threshold=20, max_salt=4)
    s = salted(edges_df, cfg)
    hub_parts = (
        s.filter(F.col("out_deg") > 20)
        .groupBy("src")
        .agg(F.countDistinct("part").alias("np"), F.max("out_deg").alias("deg"))
    )
    rows = hub_parts.collect()
    assert rows, "power-law fixture should contain hubs"
    # big hubs land on >1 partition
    assert any(r.np > 1 for r in rows if r.deg > 40)
    # non-hubs on exactly one partition
    cold = s.filter(F.col("out_deg") <= 20).groupBy("src").agg(
        F.countDistinct("part").alias("np")
    )
    assert cold.filter(F.col("np") > 1).count() == 0


def test_salting_reduces_skew(spark):
    """One giant hub: without salting everything is on one partition;
    with salting the max partition share drops."""
    pdf = random_edges(10, 10, seed=3)
    import pandas as pd

    hub = pd.DataFrame({"src": [999] * 2000, "dst": range(2000)})
    e = spark.createDataFrame(pd.concat([pdf, hub]))
    cfg = EngineConfig(graph_partitions=8, hub_degree_threshold=100, max_salt=8)
    parts = salted(e, cfg).groupBy("part").count().collect()
    mx = max(r["count"] for r in parts)
    assert mx < 2000 * 0.5  # hub split across >= 2 partitions


def test_placement_covers_all_srcs(spark, edges_df):
    cfg = EngineConfig(graph_partitions=8, hub_degree_threshold=20, max_salt=4)
    pl = placement(edges_df, cfg)
    n_src = edges_df.select("src").distinct().count()
    assert pl.select("src").distinct().count() == n_src
    # every (part) in placement exists in the salted edges
    sp = {(r.src, r.part) for r in salted(edges_df, cfg).select("src", "part").distinct().collect()}
    assert {(r.src, r.part) for r in pl.collect()} == sp


def test_block_cache_evicts_superseded_pack_ids():
    """ADVICE r2: inserting a block for a new pack_id at the same
    (path, part) evicts the superseded entry — long-lived workers must
    not accumulate one CSR copy per repack."""
    from crgp_spark.operators.pack import _BLOCK_CACHE, _cache_put

    _BLOCK_CACHE.clear()
    _cache_put(("/p", 0, "pack_a"), {"x": 1})
    _cache_put(("/p", 1, "pack_a"), {"x": 2})
    _cache_put(("/q", 0, "pack_a"), {"x": 3})
    # repack at /p: same parts, new pack_id
    _cache_put(("/p", 0, "pack_b"), {"x": 4})
    _cache_put(("/p", 1, "pack_b"), {"x": 5})
    assert ("/p", 0, "pack_a") not in _BLOCK_CACHE
    assert ("/p", 1, "pack_a") not in _BLOCK_CACHE
    assert _BLOCK_CACHE[("/p", 0, "pack_b")] == {"x": 4}
    assert ("/q", 0, "pack_a") in _BLOCK_CACHE  # other table untouched
    # cascade-layout keys share the eviction discipline
    _cache_put(("/p", 0, "cascade", "pack_a"), {"x": 6})
    _cache_put(("/p", 0, "cascade", "pack_b"), {"x": 7})
    assert ("/p", 0, "cascade", "pack_a") not in _BLOCK_CACHE
    # plain key with same (path, part) is a DIFFERENT prefix shape
    assert ("/p", 0, "pack_b") in _BLOCK_CACHE
    _BLOCK_CACHE.clear()
