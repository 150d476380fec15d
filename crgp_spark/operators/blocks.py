"""Biconnected components (blocks) and articulation points — the
vertex-connectivity siblings of `bridges.py` (same BFS-forest +
ancestor-closure substrate).

Classical reduction (the parallel-biconnectivity family, Tarjan &
Vishkin 1985 and the fundamental-cycle lemma it rests on): with ANY
spanning forest, the fundamental cycle of a non-tree edge ``{u, v}``
is the edge plus the tree path u..v; two edges of ``G`` lie in the
same block iff they are linked by a chain of fundamental cycles that
pairwise share an edge.  So:

1. tree edges are identified by their CHILD vertex (a bijection —
   no synthetic edge ids, no pairing-function overflow);
2. a non-tree edge ``{u, v}`` covers exactly the tree edges above the
   children ``c`` with exactly one of u, v in subtree(c) — i.e.
   ``c ∈ closure(u) XOR c ∈ closure(v)`` (the same crossing predicate
   `bridges.py` counts);
3. each non-tree edge STARS its covered children together (min child
   as hub — a star generates the same connectivity as the clique);
4. blocks = `connected_components` over those stars; uncovered tree
   edges are the bridges and stay singleton blocks; a non-tree edge
   inherits the block of its cycle's minimum child.

Block labels are the minimum tree-edge child vid in the block —
deterministic and oracle-checkable.  Articulation point = a vertex
incident to ≥ 2 distinct blocks (the block-cut-tree definition; leaf
and isolated vertices are incident to ≤ 1).

Scale: the cover table is O(E · tree depth) rows (the `hierarchy.py`
closure cost model — shallow for the small-world graphs this engine
targets); the star edges are |cover| rows; everything else is the
audited `connected_components`.  Every join keys on a vertex id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.operators.bridges import (
    _ancestor_closure,
    _canonical,
    bfs_forest,
)
from crgp_spark.operators.components import connected_components

__all__ = ["blocks", "articulation_points", "block_cut_tree"]


def blocks(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Every edge of the simple undirected graph with its biconnected
    component: ``(u, v, block)``, ``u < v``, ``block`` = the minimum
    tree-edge child vid of the block."""
    cfg = cfg or EngineConfig()
    und = _canonical(edges).persist()
    forest = bfs_forest(
        spark,
        und.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        cfg,
    )
    tree = forest.filter(F.col("parent").isNotNull()).select(
        "vid", "parent",
        F.least("vid", "parent").alias("u"),
        F.greatest("vid", "parent").alias("v"),
    ).localCheckpoint(eager=True)
    nontree = und.join(
        tree.select("u", "v"), ["u", "v"], "left_anti"
    ).localCheckpoint(eager=True)
    clos = _ancestor_closure(forest).localCheckpoint(eager=True)

    # cover(c; u,v): c in closure(u) XOR c in closure(v)
    cu = clos.select(F.col("vid").alias("u"), F.col("anc"))
    cv = clos.select(F.col("vid").alias("v"), F.col("anc"))
    cov = (
        nontree.join(cu, "u")
        .join(cv, ["v", "anc"], "left_anti")
        .unionByName(
            nontree.join(cv, "v").join(cu, ["u", "anc"], "left_anti")
            .select("u", "v", "anc")
        )
        .select("u", "v", F.col("anc").alias("ch"))
        .localCheckpoint(eager=True)
    )

    # star each fundamental cycle's children on its minimum child
    hub = cov.groupBy("u", "v").agg(F.min("ch").alias("hub"))
    stars = (
        cov.join(hub, ["u", "v"])
        .filter(F.col("ch") != F.col("hub"))
        .select(F.col("hub").alias("src"), F.col("ch").alias("dst"))
    )
    comp = connected_components(spark, stars, cfg, algo_name="blocks_cc")

    # tree edges: covered ones take their component label, bridges stay
    # singleton blocks labeled by their own child vid
    lab = comp.select(F.col("vid").alias("ch"), F.col("component"))
    tree_blocks = (
        tree.join(lab, tree.vid == lab.ch, "left")
        .select(
            "u", "v",
            F.coalesce("component", tree.vid).alias("block"),
        )
    )
    # non-tree edges inherit their cycle hub's block
    nt_blocks = (
        hub.join(lab, hub.hub == lab.ch, "left")
        .select(
            "u", "v",
            F.coalesce("component", F.col("hub")).alias("block"),
        )
    )
    out = tree_blocks.unionByName(nt_blocks).localCheckpoint(eager=True)
    und.unpersist()
    return out


def articulation_points(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Every articulation point (cut vertex) of the simple undirected
    graph as ``(vid)`` — a vertex incident to at least two distinct
    blocks."""
    b = blocks(spark, edges, cfg)
    incident = b.select(F.col("u").alias("vid"), "block").unionByName(
        b.select(F.col("v").alias("vid"), "block")
    )
    return (
        incident.groupBy("vid")
        .agg(F.count_distinct("block").alias("nb"))
        .filter(F.col("nb") >= 2)
        .select("vid")
    )


def block_cut_tree(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """The block-cut tree: one ``(vid, block)`` edge per (articulation
    point, incident block) pair — the bipartite tree whose nodes are
    the blocks and the cut vertices, the standard decomposition the
    block family exists to produce (path queries, cut enumeration,
    cactus-style summaries all read it)."""
    b = blocks(spark, edges, cfg)
    incident = (
        b.select(F.col("u").alias("vid"), "block")
        .unionByName(b.select(F.col("v").alias("vid"), "block"))
        .distinct()
    )
    cuts = (
        incident.groupBy("vid")
        .agg(F.count_distinct("block").alias("nb"))
        .filter(F.col("nb") >= 2)
        .select("vid")
    )
    return incident.join(cuts, "vid", "left_semi")
