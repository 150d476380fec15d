"""Borůvka minimum spanning forest over a weighted undirected edge
table — the classic log-round distributed MST algorithm (Borůvka 1926;
the GHS / Pregel-MST family all contract it the same way).

Determinism: edges are totally ordered by ``ord_key(w, u, v)``
(`functions.ord_key`), which makes "weights" distinct even when ``w``
ties — and with distinct weights the MSF is UNIQUE, so the engine, the
unrolled-round DuckDB oracle, and any textbook Kruskal agree edge for
edge.  Weights must be non-negative integers (the ord-key contract);
NULL or negative weights raise up front rather than silently ranking
wrong (the weighted-PageRank validation precedent, ADVICE r3).

Per round (all DataFrame ops, no per-row Python):

1. relabel surviving edges by current component, drop intra-component
   edges (a monotone shrink: once endpoints merge they never split);
2. every component picks its minimum incident edge — one combinable
   ``min_by`` groupBy over both edge directions; the chosen edges join
   the forest (mutual picks dedup to one row);
3. contract: each component points along its chosen edge.  With a
   total order the pointer graph's only cycles are mutual 2-cycles
   (the classic Borůvka lemma), broken by rooting the smaller id; the
   remaining functional forest collapses by pointer doubling —
   O(log chain) self-joins of a components-sized (not edges-sized)
   table, each behind `state_hint` so big state never broadcasts;
4. component labels re-map through the contraction (left join —
   isolated components keep their label).

Component count at least halves per round ⇒ ≤ log₂|V| rounds; both
loops raise loudly on budget exhaustion (`scc.py` precedent).  Plans
are truncated per step with ``localCheckpoint(eager=True)`` and stale
checkpoint blocks are released periodically (CLAUDE.md policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.functions import ord_key
from crgp_spark.plans.superstep import (
    _release_stale_checkpoints,
    reset_stats,
    state_hint,
)


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected canonical form: ``u < v``, self-loops dropped,
    parallel edges collapsed to their minimum weight, plus the total
    ordering key."""
    e = edges.select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
        F.col("w").cast("long").alias("w"),
    ).filter(F.col("u") != F.col("v"))
    e = e.groupBy("u", "v").agg(F.min("w").alias("w"))
    return e.select("u", "v", "w", ord_key("w", "u", "v").alias("ord"))


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    max_rounds: int = 24,
    max_jumps: int = 40,
) -> DataFrame:
    """The minimum spanning forest of ``(src, dst, w)``: returns
    ``(u, v, w)`` with ``u < v`` — one tree per connected component,
    unique under the ``(w, u, v)`` total order."""
    cfg = cfg or EngineConfig()
    bad = (
        edges.filter(F.col("w").isNull() | (F.col("w") < 0))
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"msf: weights must be non-negative and non-NULL, got {bad[0]}"
        )

    e = _canonical(edges).localCheckpoint(eager=True)
    comp = (
        e.select(F.col("u").alias("vid"))
        .unionByName(e.select(F.col("v").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").alias("comp"))
        .localCheckpoint(eager=True)
    )
    n = comp.count()
    forest = e.select("u", "v", "w").limit(0).localCheckpoint(eager=True)

    for rnd in range(1, max_rounds + 1):
        x = (
            e.join(
                state_hint(
                    comp.select(F.col("vid").alias("u"),
                                F.col("comp").alias("cu")), n),
                "u",
            )
            .join(
                state_hint(
                    comp.select(F.col("vid").alias("v"),
                                F.col("comp").alias("cv")), n),
                "v",
            )
            .filter(F.col("cu") != F.col("cv"))
            .localCheckpoint(eager=True)
        )
        # reset_stats on every frame that feeds a later state ⋈ state
        # join: without it the inherited size estimate compounds
        # multiplicatively round over round (and SQUARES per pointer
        # jump below) — see plans/superstep.reset_stats.
        x = reset_stats(x)
        if x.count() == 0:
            return forest

        d = x.select(
            F.col("cu").alias("c"), F.col("cv").alias("o"),
            "u", "v", "w", "ord",
        ).unionByName(
            x.select(
                F.col("cv").alias("c"), F.col("cu").alias("o"),
                "u", "v", "w", "ord",
            )
        )
        ch = (
            d.groupBy("c")
            .agg(
                F.min_by("o", "ord").alias("parent"),
                F.min_by("u", "ord").alias("u"),
                F.min_by("v", "ord").alias("v"),
                F.min_by("w", "ord").alias("w"),
            )
            .localCheckpoint(eager=True)
        )
        forest = forest.unionByName(
            ch.select("u", "v", "w").distinct()
        ).localCheckpoint(eager=True)

        # 2-cycle break: the smaller id of a mutual-min pair is a root
        b = ch.select(
            F.col("c").alias("_pc"), F.col("parent").alias("_pp")
        )
        p = (
            ch.select("c", "parent")
            .join(state_hint(b, n), F.col("parent") == F.col("_pc"))
            .select(
                "c",
                F.when(
                    (F.col("_pp") == F.col("c"))
                    & (F.col("c") < F.col("parent")),
                    F.col("c"),
                )
                .otherwise(F.col("parent"))
                .alias("parent"),
            )
            .localCheckpoint(eager=True)
        )
        p = reset_stats(p)
        for _ in range(max_jumps):
            g = p.select(
                F.col("c").alias("_jc"), F.col("parent").alias("_jp")
            )
            # p ⋈ g is state ⋈ state — the textbook squaring case
            j = reset_stats(
                p.join(state_hint(g, n), F.col("parent") == F.col("_jc"))
                .select("c", "parent", "_jp")
                .localCheckpoint(eager=True)
            )
            changed = j.filter(F.col("_jp") != F.col("parent")).count()
            p = j.select("c", F.col("_jp").alias("parent"))
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"msf: pointer doubling did not converge in {max_jumps} "
                "jumps; raise max_jumps"
            )

        comp = (
            comp.join(
                state_hint(
                    p.select(F.col("c").alias("comp"),
                             F.col("parent").alias("_nc")), n),
                "comp",
                "left",
            )
            .select("vid", F.coalesce("_nc", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        comp = reset_stats(comp)
        e = x.select("u", "v", "w", "ord")
        _release_stale_checkpoints(spark, rnd, every=2)

    raise RuntimeError(
        f"msf: did not converge in {max_rounds} rounds; raise max_rounds"
    )
