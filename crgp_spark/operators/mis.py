"""Deterministic Luby-style maximal independent set (MIS).

MIS is the classic parallel symmetry-breaking primitive (Luby 1986) —
downstream of a link graph it seeds landmark/coreset selection,
conflict-free scheduling, and diversity sampling ("pick documents no
two of which are near-duplicates" runs MIS on the near-dup graph).
Luby's algorithm needs per-round random priorities; here they are
``md5(vid:round)`` — uniform-ish, yet a pure function of the input, so
retried partitions and the DuckDB oracle reproduce the same set
bit-for-bit (the same determinism idiom as operators/walks.py).

Round ``r`` (classic Luby, on the symmetrized graph):

- a vertex JOINS the set if its priority is strictly below every
  ACTIVE neighbor's (vertices with no active neighbor join vacuously);
- winners and their neighbors deactivate ('mis' / 'out');
- remaining vertices go again with fresh priorities.

Expected O(log n) rounds to drain; ``rounds`` is fixed so the oracle
can unroll, and anything still active after the last round reports
'open' (callers either raise ``rounds`` or finish locally).

Plan shape per round: one semi-join pair restricting the edge list to
active×active, one map-side-combinable ``MIN`` per vertex, two
anti-joins — everything keys on vertex id and co-partitions with the
persisted symmetrized edge table; state follows the shared
``state_hint`` policy and every round ``localCheckpoint``s, like all
iterative operators here (reference epoch loop: ``run.rs:118-129``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint


def _pri(col: F.Column, rnd: int) -> F.Column:
    return F.md5(F.concat_ws(":", col.cast("string"), F.lit(str(rnd))))


def maximal_independent_set(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 4,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Returns ``(vid, status, rnd)`` over the symmetrized graph's
    non-isolated vertices: status 'mis' (joined the set in round
    ``rnd``), 'out' (a neighbor joined in round ``rnd``), or 'open'
    (still undecided after ``rounds``; rnd 0)."""
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
        sym.select(F.col("src").alias("vid")).distinct().localCheckpoint(eager=True)
    )
    n_active = active.count()
    decided = []

    for r in range(1, rounds + 1):
        if n_active == 0:
            break
        hint = state_hint(active, n_active)
        e_act = sym.join(hint, sym.src == F.col("vid"), "left_semi").join(
            state_hint(active.select(F.col("vid").alias("_v")), n_active),
            F.col("dst") == F.col("_v"),
            "left_semi",
        )
        mn = e_act.groupBy("src").agg(F.min(_pri(F.col("dst"), r)).alias("mn"))
        winners = (
            active.join(mn, active.vid == mn.src, "left")
            .filter(
                F.col("mn").isNull() | (_pri(F.col("vid"), r) < F.col("mn"))
            )
            .select("vid")
            .localCheckpoint(eager=True)
        )
        n_win = winners.count()
        losers = (
            sym.join(
                state_hint(winners.select(F.col("vid").alias("_w")), n_win),
                sym.src == F.col("_w"),
                "left_semi",
            )
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(state_hint(active, n_active), "vid", "left_semi")
            .join(state_hint(winners, n_win), "vid", "left_anti")
            .localCheckpoint(eager=True)
        )
        decided.append(
            winners.select(
                "vid", F.lit("mis").alias("status"),
                F.lit(r).cast("int").alias("rnd"),
            )
        )
        decided.append(
            losers.select(
                "vid", F.lit("out").alias("status"),
                F.lit(r).cast("int").alias("rnd"),
            )
        )
        active = (
            active.join(winners, "vid", "left_anti")
            .join(losers, "vid", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_active = active.count()

    out = active.select(
        "vid", F.lit("open").alias("status"), F.lit(0).cast("int").alias("rnd")
    )
    for d in decided:
        out = out.unionByName(d)
    sym.unpersist()
    return out
