"""Deterministic Jones–Plassmann greedy graph coloring.

Coloring is the scheduling primitive the MIS family (`mis.py`)
generalizes to: color classes are conflict-free execution waves —
downstream of a link graph it schedules conflicting updates
(two adjacent vertices never share a color), partitions near-dup
clusters for parallel human review, and bounds chromatic structure.

Jones–Plassmann (1993): every vertex gets a fixed random priority; in
each round the vertices whose priority is a strict local minimum among
still-uncolored neighbors pick the smallest color absent from their
already-colored neighborhood (the mex), then leave the active set.
Locally-minimal vertices form an independent set, and their colored
neighborhoods only reference earlier rounds — so the parallel rounds
produce exactly the sequential greedy coloring of the priority order.

Priorities here are ``md5(vid) || ':' || lpad(vid)`` — uniform-ish yet
a pure function of the input (the `walks.py`/`mis.py` determinism
idiom), with the vid suffix making them strictly unique so propriety
never hinges on hash-collision luck.

Per-round plan: one active×active semi-join pair, one
map-side-combinable ``MIN`` per vertex (local-minimum test), one join
of the candidates' edges against the colored state + ``collect_set``
mex fold — the set holds DISTINCT COLORS, so it is bounded by the
round number, never by vertex degree (hubs cost nothing extra).
State follows the shared ``state_hint`` policy and every round
``localCheckpoint``s, like all iterative operators here (reference
epoch loop: ``run.rs:118-129``).  Max color assigned by round ``r`` is
``r - 1``; anything still uncolored after ``rounds`` reports color -1
(callers raise ``rounds`` — expected O(log n / log log n) to drain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint


def _pri(col: Column) -> Column:
    s = col.cast("string")
    return F.concat(F.md5(s), F.lit(":"), F.lpad(s, 20, "0"))


def _mex(sorted_colors: Column) -> Column:
    # smallest non-negative int absent from the sorted distinct array:
    # fold left, bump the accumulator whenever the next element equals it
    return F.aggregate(
        sorted_colors,
        F.lit(0),
        lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
    )


def greedy_coloring(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 4,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Returns ``(vid, color, rnd)`` over the symmetrized graph's
    non-isolated vertices: ``color`` >= 0 with the round it was
    assigned in, or -1 (rnd 0) if still uncolored after ``rounds``."""
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
    active = (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_active = active.count()
    colored = spark.createDataFrame([], "vid long, color int")
    n_colored = 0
    assigned = []

    for r in range(1, rounds + 1):
        if n_active == 0:
            break
        e_act = sym.join(
            state_hint(active, n_active), sym.src == F.col("vid"), "left_semi"
        ).join(
            state_hint(active.select(F.col("vid").alias("_v")), n_active),
            F.col("dst") == F.col("_v"),
            "left_semi",
        )
        mn = e_act.groupBy("src").agg(F.min(_pri(F.col("dst"))).alias("mn"))
        cand = (
            active.join(mn, active.vid == mn.src, "left")
            .filter(F.col("mn").isNull() | (_pri(F.col("vid")) < F.col("mn")))
            .select("vid")
            .localCheckpoint(eager=True)
        )
        n_cand = cand.count()
        nc = (
            sym.join(
                state_hint(cand.select(F.col("vid").alias("_c")), n_cand),
                sym.src == F.col("_c"),
                "left_semi",
            )
            .join(
                state_hint(
                    colored.select(
                        F.col("vid").alias("_n"), F.col("color")
                    ),
                    n_colored,
                ),
                F.col("dst") == F.col("_n"),
            )
            .groupBy("src")
            .agg(F.array_sort(F.collect_set("color")).alias("cs"))
        )
        newly = (
            cand.join(nc, cand.vid == nc.src, "left")
            .select(
                "vid",
                F.coalesce(_mex(F.col("cs")), F.lit(0))
                .cast("int")
                .alias("color"),
            )
            .localCheckpoint(eager=True)
        )
        assigned.append(
            newly.select(
                "vid", "color", F.lit(r).cast("int").alias("rnd")
            )
        )
        colored = colored.unionByName(newly).localCheckpoint(eager=True)
        n_colored += n_cand
        active = active.join(cand, "vid", "left_anti").localCheckpoint(
            eager=True
        )
        n_active = active.count()

    out = active.select(
        "vid",
        F.lit(-1).cast("int").alias("color"),
        F.lit(0).cast("int").alias("rnd"),
    )
    for d in assigned:
        out = out.unionByName(d)
    sym.unpersist()
    return out
