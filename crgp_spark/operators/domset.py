"""Deterministic parallel greedy dominating set.

Dominating-set selection is the facility-location primitive downstream
of a link graph: pick a small set of vertices whose closed
neighborhoods cover everyone (monitor placement, seed-user selection,
cache-site planning). The sequential greedy (pick the vertex covering
the most uncovered, repeat) is inherently serial; the parallel variant
here admits every vertex that is a strict local maximum of the
priority ``(span, -id)`` among its neighbors, where

    span(v) = |N[v] ∩ U|   (U = still-uncovered vertices)

— the number of uncovered vertices ``v`` would newly cover. Ties break
toward the smaller id, so the order is total and the round is a pure
function of the input: retried partitions and the DuckDB oracle
reproduce the same set bit-for-bit (the ``mis.py`` determinism idiom).
Every round the global priority maximum wins, so progress is
guaranteed; ``rounds`` is fixed so the oracle can unroll, and anything
still uncovered after the last round reports 'open'.

Per-round plan shape: one span aggregate (edge ⋈ U semi-join +
map-side-combinable COUNT), one neighbor-comparison anti-join (edge ⋈
spans on both endpoints), one coverage semi-join — all keyed on vertex
id, co-partitioned with the persisted symmetrized edge table. State
follows the shared ``state_hint`` policy and ``localCheckpoint``s per
round, like every iterative operator here (reference epoch loop:
``run.rs:118-129``; the reference itself has no covering operator —
its surface stops at per-cascade statistics, ``statistics.rs:17-131``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.plans.superstep import state_hint


def dominating_set(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 4,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Returns ``(vid, status, rnd)`` over the symmetrized graph's
    non-isolated vertices: status 'dom' (joined the dominating set in
    round ``rnd``), 'covered' (first covered in round ``rnd`` and
    never became a dominator), or 'open' (uncovered after ``rounds``;
    rnd 0). A covered vertex can still become a dominator in a later
    round (it may be the best cover for its uncovered neighbors) —
    'dom' wins over 'covered' in the report."""
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
    verts = (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_verts = verts.count()

    uncovered = verts
    n_unc = n_verts
    doms: list[DataFrame] = []
    covs: list[DataFrame] = []

    for r in range(1, rounds + 1):
        if n_unc == 0:
            break
        u_hint = state_hint(
            uncovered.select(F.col("vid").alias("_u")), n_unc
        )
        # span(v) = [v ∈ U] + |N(v) ∩ U|
        nb = (
            sym.join(u_hint, sym.dst == F.col("_u"), "left_semi")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("_nb"))
        )
        in_u = uncovered.select("vid", F.lit(1).alias("_in"))
        spans = (
            verts.join(
                nb.withColumnRenamed("src", "vid").hint("shuffle_hash"),
                "vid",
                "left",
            )
            .join(state_hint(in_u, n_unc), "vid", "left")
            .select(
                "vid",
                (
                    F.coalesce(F.col("_nb"), F.lit(0))
                    + F.coalesce(F.col("_in"), F.lit(0))
                ).alias("sp"),
            )
            .localCheckpoint(eager=True)
        )
        # v loses to neighbor u if (sp_u, -u) > (sp_v, -v)
        beaten = (
            sym.join(
                spans.withColumnsRenamed({"vid": "src", "sp": "sp_s"}).hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .join(
                spans.withColumnsRenamed({"vid": "dst", "sp": "sp_d"}).hint(
                    "shuffle_hash"
                ),
                "dst",
            )
            .filter(
                (F.col("sp_d") > F.col("sp_s"))
                | (
                    (F.col("sp_d") == F.col("sp_s"))
                    & (F.col("dst") < F.col("src"))
                )
            )
            .select(F.col("src").alias("vid"))
            .distinct()
        )
        winners = (
            spans.filter(F.col("sp") >= 1)
            .join(beaten, "vid", "left_anti")
            .select("vid")
            .localCheckpoint(eager=True)
        )
        n_win = winners.count()
        w_hint = state_hint(
            winners.select(F.col("vid").alias("_w")), n_win
        )
        # newly covered = N[winners] ∩ U
        newly = (
            sym.join(w_hint, sym.src == F.col("_w"), "left_semi")
            .select(F.col("dst").alias("vid"))
            .unionByName(winners)
            .distinct()
            .join(state_hint(uncovered, n_unc), "vid", "left_semi")
            .localCheckpoint(eager=True)
        )
        doms.append(
            winners.select(
                "vid",
                F.lit("dom").alias("status"),
                F.lit(r).cast("int").alias("rnd"),
            )
        )
        covs.append(
            newly.select("vid", F.lit(r).cast("int").alias("rnd"))
        )
        uncovered = uncovered.join(
            newly, "vid", "left_anti"
        ).localCheckpoint(eager=True)
        n_unc = uncovered.count()

    dom_all = None
    for d in doms:
        dom_all = d if dom_all is None else dom_all.unionByName(d)
    cov_all = None
    for c in covs:
        cov_all = c if cov_all is None else cov_all.unionByName(c)

    out = uncovered.select(
        "vid",
        F.lit("open").alias("status"),
        F.lit(0).cast("int").alias("rnd"),
    )
    if cov_all is not None:
        cov_only = cov_all.select("vid", F.lit("covered").alias("status"), "rnd")
        if dom_all is not None:
            cov_only = cov_only.join(
                dom_all.select("vid"), "vid", "left_anti"
            )
        out = out.unionByName(cov_only)
    if dom_all is not None:
        out = out.unionByName(dom_all)
    sym.unpersist()
    return out
