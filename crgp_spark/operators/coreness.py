"""Full k-core decomposition — the core NUMBER of every vertex.

``operators/kcore.py`` answers "which vertices survive k-peeling" for
ONE k; this operator computes ``core(v)`` for every vertex at once via
the distributed h-index iteration (Montresor, De Pellegrini & Miorandi,
"Distributed k-core decomposition", IEEE TPDS 2013): initialize
``c(v) = deg(v)`` and repeat

    c(v) ← min( c(v), h-index{ c(u) : u ∈ N(v) } )

where the h-index of a multiset is the largest h with ≥ h members ≥ h.
The sequence is monotone non-increasing and its fixpoint is exactly the
peeling core number — no global peel order needed, which is what makes
the classic sequential algorithm distributable.

Scale shape per round: ONE equi-join (edges × state on the neighbor
endpoint) and one per-vertex window (``h = MAX(LEAST(c_u, rank))`` over
neighbors sorted desc — partitioned by vertex, never global). Hub
vertices are the usual window-skew case. State joins a state-derived
table every round, so the per-round checkpoint goes through
``plans/superstep.reset_stats`` (the CLAUDE.md stats-squaring rule) and
all state-side joins pin their strategy via ``state_hint``. Rounds to
converge are small in practice (bounded by the longest strictly
decreasing chain of estimates); ``fixed_rounds=R`` pins the round count
for SQL replay — iterating past the fixpoint is the identity, so any
R ≥ convergence gives the exact core numbers.

Reference graph context: ``graph.rs:17-22`` (adjacency); censuses like
this are downstream analytics the reference's users run on the derived
edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import reset_stats, state_hint


def core_decomposition(
    spark: SparkSession,
    edges: DataFrame,
    fixed_rounds: int | None = None,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Exact core numbers ``(vid, core)`` of the undirected simple graph
    under ``edges (src, dst)`` (direction and duplicates ignored,
    self-loops dropped; isolated vertices absent — same conventions as
    ``kcore``)."""
    parts = cfg.shuffle_partitions if cfg else 32
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = (
        und.unionByName(
            und.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .repartition(parts, "u")
        .localCheckpoint(eager=True)
    )
    state = e.groupBy("u").agg(F.count(F.lit(1)).alias("c"))
    state = reset_stats(state.localCheckpoint(eager=True))
    n_bound = e.count()  # |state| <= directed edge rows
    w = Window.partitionBy("u").orderBy(F.desc("cv"), "v")
    max_rounds = fixed_rounds if fixed_rounds is not None else 10_000
    prev_sum = None
    for _ in range(max_rounds):
        nb = e.join(
            state_hint(
                state.select(F.col("u").alias("v"), F.col("c").alias("cv")),
                n_bound,
            ),
            "v",
        )
        h = (
            nb.withColumn("rn", F.row_number().over(w))
            .groupBy("u")
            .agg(F.max(F.least(F.col("cv"), F.col("rn"))).alias("h"))
        )
        state = state.join(state_hint(h, n_bound), "u").select(
            "u", F.least(F.col("c"), F.col("h")).alias("c")
        )
        # state ⋈ f(state) every round: reset the inherited estimate or
        # Catalyst's size stat squares per round (CLAUDE.md rule)
        state = reset_stats(state.localCheckpoint(eager=True))
        if fixed_rounds is None:
            cur = state.agg(F.sum("c").alias("s")).collect()[0]["s"]
            if cur == prev_sum:  # monotone ⇒ equal sum = fixpoint
                break
            prev_sum = cur
    return state.select(F.col("u").alias("vid"), F.col("c").alias("core"))


def onion_decomposition(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 4,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard, Sci.
    Rep. 2016): the LAYER structure inside the k-core peeling.
    ``core_decomposition`` says how deep a vertex sits; the onion layer
    says how early it falls in the peel — the paper's probe for
    tree-like vs loopy mesostructure.

    Round ``r`` over the remaining graph: the peel threshold rises to
    ``k_r = max(k_{r-1}, min remaining degree)`` and EVERY vertex with
    remaining degree ≤ ``k_r`` is removed simultaneously as layer
    ``r`` with core number ``k_r`` (the simultaneous-removal rule is
    what makes the layer a pure function of the input — no peel order
    to break ties over). Returns ``(vid, layer, core)``; vertices
    still standing after ``rounds`` report ``(0, 0)`` ('open' — raise
    ``rounds`` to peel deeper). The assigned ``core`` equals the
    h-index fixpoint's core number for peeled vertices, which the
    tests cross-check.

    Per-round plan: one degree aggregate over the semi-join-restricted
    edge table, two 1-row scalar folds (min-degree, threshold) via
    broadcast cross-join, one anti-join to shrink the vertex state —
    all keyed on vertex id under the shared ``state_hint`` policy with
    per-round ``localCheckpoint``s."""
    parts = cfg.shuffle_partitions if cfg else 32
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = (
        und.unionByName(
            und.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .repartition(parts, "u")
        .localCheckpoint(eager=True)
    )
    active = (
        sym.select(F.col("u").alias("vid"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_act = active.count()
    k_df = spark.range(1).select(F.lit(0).cast("long").alias("_k"))
    peeled: list[DataFrame] = []

    for r in range(1, rounds + 1):
        if n_act == 0:
            break
        e_act = sym.join(
            state_hint(active.select(F.col("vid").alias("u")), n_act),
            "u",
            "left_semi",
        ).join(
            state_hint(active.select(F.col("vid").alias("v")), n_act),
            "v",
            "left_semi",
        )
        dc = e_act.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        deg = active.join(
            state_hint(dc.withColumnRenamed("u", "vid"), n_act),
            "vid",
            "left",
        ).select("vid", F.coalesce("_d", F.lit(0)).alias("d"))
        mind = deg.agg(F.min("d").alias("_md"))
        k_df = (
            k_df.crossJoin(F.broadcast(mind))
            .select(
                F.greatest(F.col("_k"), F.col("_md"))
                .cast("long")
                .alias("_k")
            )
            .localCheckpoint(eager=True)
        )
        layer = (
            deg.crossJoin(F.broadcast(k_df))
            .filter(F.col("d") <= F.col("_k"))
            .select(
                "vid",
                F.lit(r).cast("int").alias("layer"),
                F.col("_k").cast("int").alias("core"),
            )
            .localCheckpoint(eager=True)
        )
        peeled.append(layer)
        active = active.join(
            layer.select("vid"), "vid", "left_anti"
        ).localCheckpoint(eager=True)
        n_act = active.count()

    out = active.select(
        "vid",
        F.lit(0).cast("int").alias("layer"),
        F.lit(0).cast("int").alias("core"),
    )
    for p in peeled:
        out = out.unionByName(p)
    return out
