"""stream_wl: incrementally maintained 2-round WL colors == the batch
wl_refine over all drained edges."""

from __future__ import annotations

import random

from crgp_spark.config import EngineConfig
from crgp_spark.operators.wl import wl_refine
from crgp_spark.streaming.scd import write_time_chunks
from crgp_spark.streaming.wl import WlMaintainer, stream_wl


def _cfg(tmp_path):
    return EngineConfig(
        shuffle_partitions=4,
        graph_partitions=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=10_000,
    )


def _rows(n_extra=28, seed=5):
    rng = random.Random(seed)
    seq = [(1, 2), (2, 3), (3, 1), (3, 4)]
    seq += [
        (rng.randrange(1, 15), rng.randrange(1, 15)) for _ in range(n_extra)
    ]
    seq = [p for p in seq if p[0] != p[1]]
    return [(u, v, i * 10, i) for i, (u, v) in enumerate(seq)]


def test_stream_equals_batch(spark, tmp_path):
    rows = _rows()
    feed = spark.createDataFrame(
        rows, "src: long, dst: long, us: long, event_id: long"
    )
    work = str(tmp_path / "wlfeed")
    write_time_chunks(feed, work, n_chunks=4)
    got = sorted(
        map(tuple, stream_wl(spark, work, _cfg(tmp_path)).collect())
    )
    want = sorted(
        map(
            tuple,
            wl_refine(
                spark, feed.select("src", "dst"), rounds=2,
                cfg=_cfg(tmp_path),
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_epochs_touch_only_balls(spark, tmp_path):
    """Drive by hand: a batch touching an isolated far-away pair must
    leave earlier colors outside its 2-hop ball byte-identical."""
    m = WlMaintainer(spark, _cfg(tmp_path))
    b1 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src: long, dst: long"
    )
    m.process_batch(b1, 0)
    before = dict(map(tuple, m.c2.collect()))
    b2 = spark.createDataFrame([(50, 51)], "src: long, dst: long")
    m.process_batch(b2, 1)
    after = dict(map(tuple, m.c2.collect()))
    assert m.epochs == 2
    for v in (1, 2, 3):
        assert after[v] == before[v]
    assert 50 in after and 51 in after and after[50] == after[51]
