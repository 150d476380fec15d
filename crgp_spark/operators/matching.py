"""Deterministic maximal matching (parallel local-min edge rounds).

Matching is MIS's edge-side twin (Israeli & Itai 1986): pick a set of
edges no two of which share an endpoint, maximal under inclusion.
Downstream of a link graph it drives pairwise dedup resolution ("keep
one of each near-dup pair"), graph coarsening for multilevel
partitioners (the Metis contraction step), and load-balanced pairing
of conversation participants.

Round ``r`` on the canonicalized undirected edge set: every active
edge draws the deterministic priority ``md5(u:v:r)``; an edge whose
priority equals the MIN at BOTH its endpoints is a local minimum and
joins the matching (two adjacent edges cannot both be local minima
with distinct priorities); matched endpoints deactivate their
remaining edges.  Priorities are pure functions of the input — the
module family's determinism idiom (`mis.py`, `walks.py`) — so retried
partitions and the DuckDB oracle reproduce the same matching
bit-for-bit.  ``rounds`` is fixed so the oracle can unroll; expected
drain is O(log n) rounds.

Plan shape per round: one explode of each edge into its two endpoint
rows, one map-side-combinable per-vertex ``MIN``, one join back on
each endpoint, two anti-joins against the matched-vertex set (under
the repo-wide ``state_hint`` policy), one ``localCheckpoint`` — the
iterative-operator contract.  Everything keys on vertex/edge ids;
state volume is the active edge set, monotonically shrinking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint


def _pri(u: F.Column, v: F.Column, rnd: int) -> F.Column:
    return F.md5(
        F.concat_ws(":", u.cast("string"), v.cast("string"), F.lit(str(rnd)))
    )


def maximal_matching(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 4,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Returns matched edges ``(u, v, rnd)`` — ``u < v`` canonical,
    ``rnd`` the round that selected the pair.  Maximality holds for
    every vertex whose edges drained within ``rounds`` (callers raise
    ``rounds`` for full maximality, as with `mis.py`)."""
    cfg = cfg or EngineConfig()
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .repartition(cfg.shuffle_partitions, "u")
        .localCheckpoint(eager=True)
    )
    active = und
    n_active = active.count()
    picked = []

    for r in range(1, rounds + 1):
        if n_active == 0:
            break
        pri = active.select("u", "v", _pri(F.col("u"), F.col("v"), r).alias("p"))
        ends = pri.select(F.col("u").alias("vid"), "p").unionByName(
            pri.select(F.col("v").alias("vid"), "p")
        )
        vmin = ends.groupBy("vid").agg(F.min("p").alias("mn"))
        winners = (
            pri.join(
                state_hint(vmin.select(F.col("vid").alias("_a"), F.col("mn").alias("_ma")), n_active * 2),
                (F.col("u") == F.col("_a")) & (F.col("p") == F.col("_ma")),
                "left_semi",
            )
            .join(
                state_hint(vmin.select(F.col("vid").alias("_b"), F.col("mn").alias("_mb")), n_active * 2),
                (F.col("v") == F.col("_b")) & (F.col("p") == F.col("_mb")),
                "left_semi",
            )
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        picked.append(
            winners.select("u", "v", F.lit(r).cast("int").alias("rnd"))
        )
        matched = (
            winners.select(F.col("u").alias("vid"))
            .unionByName(winners.select(F.col("v").alias("vid")))
            .distinct()
        )
        # hint bound: matched <= 2 * active edges — an upper bound is
        # all state_hint needs, no extra count action per round
        active = (
            active.join(
                state_hint(matched.select(F.col("vid").alias("_m")), n_active * 2),
                F.col("u") == F.col("_m"),
                "left_anti",
            )
            .join(
                state_hint(matched.select(F.col("vid").alias("_m")), n_active * 2),
                F.col("v") == F.col("_m"),
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
        n_active = active.count()

    out = None
    for p in picked:
        out = p if out is None else out.unionByName(p)
    if out is None:  # no edges at all
        return spark.createDataFrame([], "u long, v long, rnd int")
    return out


def contract_matching(
    spark: SparkSession,
    edges: DataFrame,
    matched: DataFrame,
) -> DataFrame:
    """Coarsen the graph by contracting each matched pair ``(u, v)``
    into the supernode ``u`` — the multilevel-partitioner (Metis)
    coarsening step `maximal_matching` exists to feed.  Returns the
    coarse multigraph as ``(src, dst, weight)``: parallel edges
    collapse into integer weights, self-loops (intra-pair edges)
    drop.

    Scale shape: two broadcast-or-shuffle joins of the edge table
    against the |matching|-row rename map plus one map-side-combinable
    ``groupBy`` — a single pass over the edges."""
    ren = matched.select(F.col("v").alias("vid"), F.col("u").alias("rep"))
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    e = (
        e.join(ren.withColumnRenamed("vid", "src"), "src", "left")
        .select(F.coalesce("rep", "src").alias("rs"), "dst")
        .join(ren.withColumnRenamed("vid", "dst"), "dst", "left")
        .select("rs", F.coalesce("rep", "dst").alias("rd"))
    )
    return (
        e.filter(F.col("rs") != F.col("rd"))
        .groupBy(F.col("rs").alias("src"), F.col("rd").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
