"""stream_components: per-epoch contraction labels == one batch
connected_components run; later epochs must MERGE components formed in
earlier ones."""

from __future__ import annotations

from crgp_spark.config import EngineConfig
from crgp_spark.operators.components import connected_components
from crgp_spark.streaming.graph import ComponentMaintainer, stream_components
from crgp_spark.streaming.scd import write_time_chunks


def _cfg(tmp_path):
    return EngineConfig(
        shuffle_partitions=4,
        graph_partitions=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=10_000,
    )


# 8 edges over 4 chunks of 2 (ordered by us): chunks 0-1 build FOUR
# separate components {1,2} {3,4} {10,11} {12,13}; chunk 2 merges the
# first two pairs; chunk 3 merges the second two AND re-touches vertex
# 1 — exercising cross-epoch merge of already-contracted labels.
EDGES = [
    (1, 2, 10), (3, 4, 20),
    (10, 11, 30), (12, 13, 40),
    (2, 3, 50), (20, 21, 60),
    (11, 12, 70), (1, 30, 80),
]


def _feed(spark):
    return spark.createDataFrame(
        [(u, v, us, v) for u, v, us in EDGES],
        "src: long, dst: long, us: long, event_id: long",
    )


def test_stream_equals_batch(spark, tmp_path):
    cfg = _cfg(tmp_path)
    work = str(tmp_path / "feed")
    write_time_chunks(_feed(spark), work, n_chunks=4)
    got = sorted(
        map(
            tuple,
            stream_components(spark, work, cfg)
            .select("vid", "component")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            connected_components(
                spark,
                _feed(spark).select("src", "dst"),
                cfg,
                algo_name="batch_cc_ref",
            )
            .select("vid", "component")
            .collect(),
        )
    )
    assert got == want
    # {1,2,3,4,30} merge to 1; {10..13} to 10; {20,21} to 20
    lab = dict(got)
    assert {lab[v] for v in (1, 2, 3, 4, 30)} == {1}
    assert {lab[v] for v in (10, 11, 12, 13)} == {10}
    assert {lab[v] for v in (20, 21)} == {20}


def test_epochs_and_intermediate_labels(spark, tmp_path):
    """Drive the maintainer by hand: after 2 epochs the pairs are
    separate; epoch 3 merges {1,2}+{3,4} — the contraction must carry
    earlier labels correctly."""
    cfg = _cfg(tmp_path)
    m = ComponentMaintainer(spark, cfg)
    chunks = [EDGES[i : i + 2] for i in range(0, 8, 2)]
    for i, ch in enumerate(chunks):
        batch = spark.createDataFrame(
            [(u, v) for u, v, _us in ch], "src: long, dst: long"
        )
        m.process_batch(batch, i)
        if i == 1:
            lab = {r["vid"]: r["component"] for r in m.labels.collect()}
            assert lab[1] == lab[2] == 1 and lab[3] == lab[4] == 3
        if i == 2:
            lab = {r["vid"]: r["component"] for r in m.labels.collect()}
            assert lab[1] == lab[2] == lab[3] == lab[4] == 1
            assert lab[20] == lab[21] == 20
    assert m.epochs == 4
    lab = {r["vid"]: r["component"] for r in m.labels.collect()}
    assert lab[30] == 1 and lab[13] == 10


def test_stream_triangles_equals_batch(spark, tmp_path):
    """Triangles split across epochs: {1,2,3} completes in chunk 2,
    {2,3,4} in chunk 3, the K4 on {10..13} accretes over all chunks —
    plus a duplicate edge replay that must be idempotent."""
    from crgp_spark.operators.triangles import triangles as batch_triangles
    from crgp_spark.streaming.graph import stream_triangles

    cfg = _cfg(tmp_path)
    k4 = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    seq = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (1, 2)] + k4
    rows = [(u, v, i * 10, i) for i, (u, v) in enumerate(seq)]
    feed = spark.createDataFrame(
        rows, "src: long, dst: long, us: long, event_id: long"
    )
    work = str(tmp_path / "trifeed")
    write_time_chunks(feed, work, n_chunks=4)
    got = sorted(
        map(tuple, stream_triangles(spark, work, cfg).collect())
    )
    _total, per_vertex = batch_triangles(
        spark, feed.select("src", "dst"), cfg
    )
    want = sorted(map(tuple, per_vertex.select("vid", "triangles").collect()))
    assert got == want
    lab = dict(got)
    # K4 gives 3 triangles per vertex; 1,4 in one triangle; 2,3 in two
    assert lab[10] == lab[11] == lab[12] == lab[13] == 3
    assert lab[1] == lab[4] == 1 and lab[2] == lab[3] == 2
