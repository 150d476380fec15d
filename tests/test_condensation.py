"""Condensation DAG + critical-path layers (operators/scc.py) and the
block-cut tree (operators/blocks.py) on fixtures with known answers."""

from __future__ import annotations

from crgp_spark.config import EngineConfig
from crgp_spark.operators.blocks import block_cut_tree
from crgp_spark.operators.scc import condensation, condensation_layers


def _cfg(tmp_path):
    return EngineConfig(
        shuffle_partitions=4,
        graph_partitions=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=10_000,
    )


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


# 3-cycle {1,2,3} -> 2-cycle {4,5} -> singleton 6; 7 -> 4 side feed
PAIRS = [
    (1, 2), (2, 3), (3, 1),
    (3, 4), (4, 5), (5, 4),
    (5, 6),
    (7, 4),
]


def test_condensation_edges(spark, tmp_path):
    got = sorted(
        map(tuple, condensation(spark, _edges(spark, PAIRS), _cfg(tmp_path)).collect())
    )
    assert got == [(1, 4), (4, 6), (7, 4)]


def test_condensation_layers(spark, tmp_path):
    got = dict(
        map(
            tuple,
            condensation_layers(
                spark, _edges(spark, PAIRS), _cfg(tmp_path)
            ).collect(),
        )
    )
    assert got == {1: 0, 7: 0, 4: 1, 6: 2}


def test_condensation_of_dag_is_identity(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (1, 3)]
    got = sorted(
        map(tuple, condensation(spark, _edges(spark, pairs), _cfg(tmp_path)).collect())
    )
    assert got == [(1, 2), (1, 3), (2, 3)]
    layers = dict(
        map(
            tuple,
            condensation_layers(
                spark, _edges(spark, pairs), _cfg(tmp_path)
            ).collect(),
        )
    )
    assert layers == {1: 0, 2: 1, 3: 2}


def test_block_cut_tree_barbell(spark, tmp_path):
    # triangle {1,2,3} - bridge (3,4) - triangle {4,5,6}:
    # cut vertices 3 and 4, blocks labeled 2 (tri1), 4 (bridge), 5 (tri2)
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    got = sorted(
        map(
            tuple,
            block_cut_tree(spark, _edges(spark, pairs), _cfg(tmp_path)).collect(),
        )
    )
    blocks_of_3 = {b for v, b in got if v == 3}
    blocks_of_4 = {b for v, b in got if v == 4}
    assert {v for v, _b in got} == {3, 4}
    assert len(blocks_of_3) == 2 and len(blocks_of_4) == 2
    # the bridge block is shared between the two cut vertices
    assert blocks_of_3 & blocks_of_4
