"""Seeded shortest-path betweenness (integer-exact sampled pairs).

Exact betweenness is all-pairs (Brandes is O(V·E) — quadratic-ish at
graph scale), so every production system samples it; the standard
estimators (Brandes-Pich 2007 source sampling, KADABRA's pair sampling)
keep per-sample work to two BFS traversals.  This operator is the
pair-sampled variant made *deterministic and integer-exact* so the
DuckDB oracle twin can reproduce it bit-for-bit:

* ``n_seeds`` source vertices are chosen by smallest ``md5(vid)`` —
  a deterministic pseudo-random spread, the module family's idiom
  (walks.py, sample.py use the same trick);
* each seed ``s`` is paired with its FARTHEST vertex within
  ``radius`` hops, ties broken by smallest ``md5(vid)`` — pairing
  inside the seed's own component by construction, so conversation-
  partitioned influence graphs (every derivation output) still yield
  meaningful pairs;
* for each pair, every vertex ``v`` strictly between ``s`` and ``t``
  on some shortest path contributes ``sigma(s,v) * sigma(v,t)`` —
  the exact number of s-t geodesics through ``v`` (the betweenness
  numerator).  Path counts are BIGINT sums; no division anywhere, so
  both engines agree exactly.

Shortest-path counting is the textbook BFS DP: a vertex first reached
at level ``d`` has ``sigma = sum of sigma over its level-(d-1)
neighbors`` (only frontier predecessors can contribute — an earlier-
level neighbor would have claimed ``v`` earlier).  On the undirected
(symmetrized) graph ``sigma(v,t) = sigma(t,v)``, so the backward pass
is a second multi-source forward BFS from the target set.

Scale shape at 100 TB: two multi-source BFS sweeps of ``radius``
supersteps each — per level one shuffle join against the symmetrized
edge table, one map-side-combinable ``groupBy(source, vertex)
SUM(sigma)`` and one anti-join against the visited set.  State volume
is ``n_seeds × reach-within-radius`` rows spread across the cluster
(seeds bounded by the caller, radius bounds the frontier), never
|V|²; the final pair combine joins the two visited tables on the
vertex key.  ``localCheckpoint`` per level keeps the plan tree flat
(the repo-wide iterative-operator rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint


def _md5v(col):
    return F.md5(F.col(col).cast("string"))


def _bfs_sigma(
    sources: DataFrame, sym: DataFrame, radius: int, state_bound: int
) -> DataFrame:
    """Multi-source BFS with geodesic counting.  ``sources``: one
    column ``s``.  Returns ``(s, v, d, sig)`` for every vertex within
    ``radius`` of its source (including ``d=0`` self rows).

    ``state_bound`` is an upper bound on the per-level state size
    (sources x vertices) fed to the repo-wide ``state_hint`` policy:
    per-iteration state tables must never be Catalyst-broadcast on
    large graphs (bounded executor heaps OOM on accumulated broadcast
    maps — the round-2 multi-JVM lesson)."""
    frontier = sources.select(
        F.col("s"),
        F.col("s").alias("v"),
        F.lit(1).cast("long").alias("sig"),
    ).localCheckpoint(eager=True)
    visited = frontier.select("s", "v", F.lit(0).alias("d"), "sig")
    for d in range(1, radius + 1):
        nxt = (
            sym.join(state_hint(frontier, state_bound), sym.src == frontier.v)
            .groupBy("s", F.col("dst").alias("nv"))
            .agg(F.sum("sig").alias("sig"))
            .withColumnRenamed("nv", "v")
            .join(
                state_hint(visited.select("s", "v"), state_bound),
                ["s", "v"],
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(
            nxt.select("s", "v", F.lit(d).alias("d"), "sig")
        )
        frontier = nxt
    return visited


def betweenness_seeded(
    spark: SparkSession,
    edges: DataFrame,
    n_seeds: int = 8,
    radius: int = 4,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Sampled-pair betweenness numerators on the symmetrized graph.

    Returns one row per vertex that lies strictly inside at least one
    sampled geodesic: ``(vid, n_pairs, paths)`` where ``n_pairs``
    counts the sampled pairs whose shortest paths pass through ``vid``
    and ``paths`` is the total BIGINT geodesic count through it.
    Seeds whose farthest reach is one hop (star centers, leaves)
    contribute pairs with no interior vertices and drop out naturally.
    """
    cfg = cfg or EngineConfig()
    fwd = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition(cfg.shuffle_partitions, "src")
        .persist()
    )

    verts = sym.select(F.col("src").alias("vid")).distinct()
    n_vert = verts.count()  # one cheap action; bounds the BFS state
    state_bound = n_seeds * n_vert
    seeds = (
        verts.orderBy(_md5v("vid"))
        .limit(n_seeds)
        .select(F.col("vid").alias("s"))
    )

    vis_s = _bfs_sigma(seeds, sym, radius, state_bound)

    # pair each seed with its farthest in-radius vertex (md5 tie-break)
    far = (
        vis_s.filter(F.col("d") > 0)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("s").orderBy(
                    F.col("d").desc(), _md5v("v")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("s", F.col("v").alias("t"), F.col("d").alias("d_st"))
    )

    targets = far.select(F.col("t").alias("s")).distinct()
    vis_t = _bfs_sigma(targets, sym, radius, state_bound)

    a = vis_s.select(
        F.col("s"), F.col("v"), F.col("d").alias("da"), F.col("sig").alias("siga")
    )
    b = vis_t.select(
        F.col("s").alias("t"),
        F.col("v"),
        F.col("d").alias("db"),
        F.col("sig").alias("sigb"),
    )
    through = (
        far.join(a, "s")
        .join(b, ["t", "v"])
        .filter(
            (F.col("da") + F.col("db") == F.col("d_st"))
            & (F.col("v") != F.col("s"))
            & (F.col("v") != F.col("t"))
        )
        .select("s", "t", "v", (F.col("siga") * F.col("sigb")).alias("paths"))
    )
    res = (
        through.groupBy(F.col("v").alias("vid"))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_pairs"),
            F.sum("paths").alias("paths"),
        )
    )
    # the combine stage reads only the per-level checkpoints (never sym
    # directly), so releasing the edge cache here is safe
    sym.unpersist()
    return res
