"""Bridges and 2-edge-connected components of an undirected graph —
the cut-edge family (the classic complement of the articulation
toolbox: `components.py` answers "is it connected", `kcore.py` "how
dense", this module "which single edges hold it together").

A bridge is an edge whose removal disconnects its component; the
2-edge-connected components (2ECC) are the equivalence classes left
after deleting every bridge.  On a conversation influence graph the
bridges are exactly the influence links with no redundant path — the
single points of failure of information flow (reference semantics
context: the reconstructed cascade graph, reconstruct.rs:37-134, is
what users run such resilience questions against downstream).

Exact, deterministic, all-DataFrame pipeline (no hashing, no
randomness — unlike the XOR-sketch folklore trick, the output is
bit-reproducible and oracle-checkable):

1. **BFS spanning forest.** Roots = the component minimum vertex id
   (`components.connected_components`); hop distances via the audited
   multi-source `bfs.bfs_hops`; parent(v) = the MINIMUM neighbor one
   hop closer.  Deterministic, and BFS depth = source eccentricity —
   shallow for the small-world graphs this engine targets.
2. **Ancestor closure.** (vid, anc, anc_dist) pairs by walking parent
   pointers — O(V · depth) rows, the `hierarchy.py` cost model; for
   pathologically deep graphs the documented alternative is
   Euler-tour interval labeling.
3. **Exact subtree crossing counts.** A tree edge above child ``c`` is
   a bridge iff NO non-tree edge has exactly one endpoint inside
   subtree(c).  Counting form (integer-exact):
   ``crossing(c) = S1(c) - 2 * S2(c)`` where S1 counts non-tree edge
   ENDPOINTS in subtree(c) (closure join) and S2 counts non-tree edges
   whose LCA lies in subtree(c) (both endpoints inside ⟺ their LCA is
   a descendant-or-self of c).  LCA per non-tree edge = the deepest
   common ancestor — one closure self-join + ``max_by``.
4. **2ECC** = `connected_components` over the non-bridge edges,
   isolated survivors self-labeled.

Semantics: bridges of the SIMPLE graph underlying the edge table
(parallel edges collapse; a true multi-edge is never a bridge, so
callers with multiplicity semantics should pre-filter count==1 pairs).

Scale: every join keys on a vertex id; the non-tree endpoint/LCA
aggregations are map-side-combinable counts; loop state joins follow
the `state_hint` policy and every superstep localCheckpoints (CLAUDE.md
rules).  The budget caps raise loudly (`scc.py` precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.operators.bfs import bfs_hops
from crgp_spark.operators.components import connected_components
from crgp_spark.plans.superstep import state_hint

__all__ = ["bfs_forest", "bridges", "two_edge_components"]


def _canonical(edges: DataFrame) -> DataFrame:
    """Simple undirected form: ``u < v``, self-loops and parallel
    edges dropped."""
    return (
        edges.select(
            F.least("src", "dst").cast("long").alias("u"),
            F.greatest("src", "dst").cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def bfs_forest(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    max_iterations: int | None = None,
) -> DataFrame:
    """Deterministic BFS spanning forest of the undirected graph:
    ``(vid, comp, dist, parent)`` — one row per vertex touched by an
    edge, ``parent`` NULL exactly at the roots (the component-minimum
    vertices)."""
    cfg = cfg or EngineConfig()
    und = _canonical(edges).persist()
    adj = (
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .persist()
    )
    comp = connected_components(
        spark, und.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        cfg, algo_name="bridges_cc",
    )
    roots = comp.select(F.col("component").alias("vid")).distinct()
    dist = bfs_hops(
        spark,
        adj.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        roots,
        cfg,
        max_iterations=max_iterations,
    )
    # parent(v) = MIN neighbor one hop closer — unique-tree determinism
    d0 = dist.select(F.col("vid").alias("pv"), F.col("dist").alias("pd"))
    parents = (
        dist.join(adj, dist.vid == adj.a)
        .join(d0, (F.col("b") == F.col("pv")) & (F.col("pd") == dist.dist - 1))
        .groupBy("vid", "dist")
        .agg(F.min("b").alias("parent"))
    )
    out = (
        comp.join(dist, "vid")
        .join(parents.select("vid", "parent"), "vid", "left")
        .select("vid", F.col("component").alias("comp"), "dist", "parent")
    )
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    adj.unpersist()
    return out


def _ancestor_closure(
    forest: DataFrame, max_depth: int = 256
) -> DataFrame:
    """``(vid, anc, anc_dist)`` for every ancestor-or-self ``anc`` of
    ``vid`` — parent-pointer walk, one superstep per tree level
    (frontier = deepest open pairs only; O(V · depth) total rows)."""
    par = forest.select(
        F.col("vid").alias("child"), "parent"
    ).filter(F.col("parent").isNotNull()).localCheckpoint(eager=True)
    n_par = par.count()

    closure = forest.select("vid", F.col("vid").alias("anc")).localCheckpoint(
        eager=True
    )
    frontier = closure
    for _ in range(max_depth):
        nxt = (
            frontier.join(
                state_hint(par, n_par), frontier.anc == par.child
            )
            .select("vid", F.col("parent").alias("anc"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt)
        frontier = nxt
    else:
        raise RuntimeError(
            f"ancestor closure did not terminate within {max_depth} levels"
        )
    depth = forest.select(F.col("vid").alias("anc"), F.col("dist").alias("anc_dist"))
    return closure.join(depth, "anc").select("vid", "anc", "anc_dist")


def bridges(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    forest: DataFrame | None = None,
) -> DataFrame:
    """Every bridge of the simple undirected graph as ``(u, v)`` with
    ``u < v``.  Pass a precomputed ``forest`` (from `bfs_forest`) to
    share it with `two_edge_components`."""
    cfg = cfg or EngineConfig()
    und = _canonical(edges).persist()
    if forest is None:
        forest = bfs_forest(spark, und.select(
            F.col("u").alias("src"), F.col("v").alias("dst")
        ), cfg)
    tree = forest.filter(F.col("parent").isNotNull()).select(
        F.least("vid", "parent").alias("u"),
        F.greatest("vid", "parent").alias("v"),
    )
    nontree = und.join(tree, ["u", "v"], "left_anti").localCheckpoint(
        eager=True
    )
    clos = _ancestor_closure(forest).localCheckpoint(eager=True)

    # LCA of each non-tree edge: deepest common ancestor (a chain —
    # depths are distinct, so max_by is unambiguous)
    cu = clos.select(
        F.col("vid").alias("u"), F.col("anc"), F.col("anc_dist")
    )
    cv = clos.select(F.col("vid").alias("v"), F.col("anc"))
    lca = (
        nontree.join(cu, "u")
        .join(cv, ["v", "anc"])
        .groupBy("u", "v")
        .agg(F.max_by("anc", "anc_dist").alias("l"))
    )
    # S1: non-tree endpoints inside subtree(anc)
    endpoints = nontree.select(F.col("u").alias("x")).unionAll(
        nontree.select(F.col("v").alias("x"))
    )
    s1 = (
        endpoints.join(clos, clos.vid == F.col("x"))
        .groupBy("anc")
        .agg(F.count(F.lit(1)).alias("s1"))
    )
    # S2: non-tree edges fully inside subtree(anc) ⟺ LCA inside
    s2 = (
        lca.join(clos, clos.vid == lca.l)
        .groupBy("anc")
        .agg(F.count(F.lit(1)).alias("n_in"))
    )
    children = forest.filter(F.col("parent").isNotNull()).select(
        "vid", "parent"
    )
    out = (
        children.join(s1.withColumnRenamed("anc", "vid"), "vid", "left")
        .join(s2.withColumnRenamed("anc", "vid"), "vid", "left")
        .filter(
            F.coalesce(F.col("s1"), F.lit(0))
            - 2 * F.coalesce(F.col("n_in"), F.lit(0))
            == 0
        )
        .select(
            F.least("vid", "parent").alias("u"),
            F.greatest("vid", "parent").alias("v"),
        )
    )
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    return out


def two_edge_components(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """2-edge-connected components: ``(vid, ecc2)`` where ``ecc2`` is
    the minimum vertex id of the class — `connected_components` over
    the graph minus its bridges, bridge-stranded vertices self-labeled."""
    cfg = cfg or EngineConfig()
    und = _canonical(edges).persist()
    forest = bfs_forest(spark, und.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ), cfg)
    br = bridges(
        spark,
        und.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        cfg,
        forest=forest,
    )
    keep = und.join(br, ["u", "v"], "left_anti")
    labeled = connected_components(
        spark,
        keep.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        cfg,
        algo_name="ecc2_cc",
    ).select("vid", F.col("component").alias("ecc2"))
    singletons = (
        forest.select("vid")
        .join(labeled.select("vid"), "vid", "left_anti")
        .select("vid", F.col("vid").alias("ecc2"))
    )
    out = labeled.unionByName(singletons)
    und.unpersist()
    return out
