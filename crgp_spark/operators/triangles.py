"""Exact triangle counting via degree orientation + two-hop join —
north-rule extension.

Each undirected edge is oriented from the endpoint with smaller
``(degree, id)`` to the larger, so every triangle has exactly one apex
with two out-edges; wedges (two out-edges of one apex) are then
semi-joined against the edge set. The orientation bounds the join fan-out
by the graph's degeneracy instead of its max degree — the standard trick
that makes triangle counting survive power-law graphs at scale (a hub of
degree d contributes O(d·degeneracy) wedges, not O(d²)).

All DataFrame ops (distinct → groupBy degree → joins); Catalyst/AQE pick
the join strategies; no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _undirected(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge from lower (degree, id) to higher."""
    und = _undirected(edges)
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # shuffle_hash everywhere: deg and the edge tables are |V|/|E|-sized
    # — Catalyst's size estimate can fall under the session's generous
    # broadcast threshold and OOM bounded executor heaps (and shipping
    # the whole graph to every executor is wrong at scale regardless)
    e = (
        und.join(
            deg.withColumnsRenamed({"vid": "a", "deg": "deg_a"}).hint(
                "shuffle_hash"
            ),
            "a",
        )
        .join(
            deg.withColumnsRenamed({"vid": "b", "deg": "deg_b"}).hint(
                "shuffle_hash"
            ),
            "b",
        )
    )
    fwd = F.struct("deg_a", "a") < F.struct("deg_b", "b")
    return e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangles(
    spark: SparkSession, edges: DataFrame, cfg=None,
    materialize: bool = True,
) -> tuple[int, DataFrame]:
    """Returns ``(global_count, per_vertex)`` with
    ``per_vertex(vid, triangles)`` — exact, treating the edge table as an
    undirected simple graph.  ``materialize=False`` returns the lazy
    per-vertex plan (cached inputs NOT released — plan-inspection use
    only, e.g. EXPLAIN.md generation)."""
    o = oriented_edges(edges).persist()
    und = _undirected(edges)

    e1 = o.select(F.col("lo").alias("apex"), F.col("hi").alias("w1"))
    e2 = o.select(F.col("lo").alias("apex"), F.col("hi").alias("w2"))
    wedges = e1.join(e2.hint("shuffle_hash"), "apex").filter(
        F.col("w1") < F.col("w2")
    )
    tri = wedges.join(
        und.hint("shuffle_hash"),
        (F.col("w1") == F.col("a")) & (F.col("w2") == F.col("b")),
        "left_semi",
    ).persist()

    total = tri.count()
    per_vertex = (
        tri.select(F.col("apex").alias("vid"))
        .unionByName(tri.select(F.col("w1").alias("vid")))
        .unionByName(tri.select(F.col("w2").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    # vertices in no triangle -> 0
    all_v = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .distinct()
    )
    # materialize before releasing tri's cached blocks (ADVICE r4: long
    # driver-gate sessions leak accumulated caches otherwise)
    per_vertex = all_v.join(per_vertex, "vid", "left").select(
        "vid", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
    if not materialize:
        return total, per_vertex
    per_vertex = per_vertex.localCheckpoint(eager=True)
    tri.unpersist()
    o.unpersist()
    return total, per_vertex


def four_cliques(
    spark: SparkSession, edges: DataFrame,
    materialize: bool = True,
) -> tuple[int, DataFrame]:
    """Exact 4-clique (K4) counting: ``(global_count, per_vertex)``
    with ``per_vertex(vid, k4)`` over the undirected simple graph.

    Enumeration extends the degeneracy orientation one level: with
    every edge oriented by ascending ``(degree, id)``, each K4 has a
    unique all-forward ordering ``u→v→w→x``, found by extending each
    all-forward triangle ``(u,v,w)`` along ``w``'s out-edges and
    semi-joining the two closing edges ``(v,x)`` and ``(u,x)``. The
    orientation bounds every fan-out by the degeneracy (wedges
    O(E·degeneracy), triangle extensions O(T·degeneracy)) — the same
    property that makes the triangle pass survive power-law graphs, so
    no hub ever drives a quadratic blow-up. All joins are
    shuffle-hash-hinted DataFrame ops; no Python.

    Reference's motif surface stops at triads; K4 density is the
    standard next motif users compute on its derived graphs (clique-
    heavy conversations = tightly-coupled participant groups)."""
    o = oriented_edges(edges).persist()

    e1 = o.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2 = o.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    wedges = e1.join(e2.hint("shuffle_hash"), "u").filter(
        F.col("v") != F.col("w")
    )
    # all-forward triangles u→v→w: wedge (u,v),(u,w) + oriented edge v→w
    tri = wedges.join(
        o.hint("shuffle_hash"),
        (F.col("v") == F.col("lo")) & (F.col("w") == F.col("hi")),
        "left_semi",
    )
    # extend along w's out-edges, then close v→x and u→x
    ext = tri.join(
        o.withColumnsRenamed({"lo": "w", "hi": "x"}).hint("shuffle_hash"),
        "w",
    )
    ext = ext.join(
        o.withColumnsRenamed({"lo": "v", "hi": "x"}).hint("shuffle_hash"),
        ["v", "x"],
        "left_semi",
    )
    k4 = ext.join(
        o.withColumnsRenamed({"lo": "u", "hi": "x"}).hint("shuffle_hash"),
        ["u", "x"],
        "left_semi",
    ).persist()

    total = k4.count()
    per_vertex = (
        k4.select(F.col("u").alias("vid"))
        .unionByName(k4.select(F.col("v").alias("vid")))
        .unionByName(k4.select(F.col("w").alias("vid")))
        .unionByName(k4.select(F.col("x").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("k4"))
    )
    und = _undirected(edges)
    all_v = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .distinct()
    )
    # materialize before releasing k4's cached blocks: long driver-gate
    # sessions run many queries, and leaked caches accumulate (ADVICE r4)
    per_vertex = all_v.join(per_vertex, "vid", "left").select(
        "vid", F.coalesce("k4", F.lit(0)).alias("k4")
    )
    if not materialize:
        return total, per_vertex
    per_vertex = per_vertex.localCheckpoint(eager=True)
    k4.unpersist()
    o.unpersist()
    return total, per_vertex
