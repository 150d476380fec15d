"""Bounded-radius harmonic centrality (undirected).

Harmonic centrality ``H(v) = Σ_{u≠v} 1/d(u,v)`` is the textbook
centrality that stays well-defined on disconnected graphs — exactly the
shape of a conversation-partitioned influence graph.  Exact all-pairs
distances are quadratic, so at scale the standard practice (HyperBall,
Boldi & Vigna 2013) bounds the radius: this operator computes the
radius-``R`` truncation ``H_R(v) = Σ_{d=1..R} n_d(v)/d`` where
``n_d(v)`` counts vertices at shortest-path distance exactly ``d``.

Cross-engine exactness: the kernel and the DuckDB oracle both emit the
integer level counts ``n_d`` and derive ``H_R`` as ONE division of the
integer ``Σ (L/d)·n_d`` (L = lcm(1..R)) by ``L`` — no float summation
order anywhere, so both engines agree bit-for-bit.

Two execution paths, same results:

- ``harmonic_bounded`` — generic distributed level-set BFS from every
  vertex simultaneously: state is ``(s, v)`` pairs keyed by source,
  one shuffle join per level against the symmetrized edge table, new
  pairs anti-joined against the accumulated reach set.  Works on any
  edge table; state volume = pairs-within-radius, the problem's output
  size, spread across the cluster.
- ``cascade_harmonic`` — conversation-local kernel (see
  operators/cascade.py: influence edges never cross conversations, so
  distances are conversation-local): one ``applyInPandas`` pass, each
  conversation's all-source BFS run as vectorized boolean frontier
  sweeps (``np.logical_or.at`` edge scatter, O(R·E·V/conv) bit-ops, no
  per-row Python).  Conversations too large for the dense frontier
  matrix (``KERNEL_MAX_VERTICES``) fall back to the generic path over
  their edges only and union in — the split-residue hybrid pattern.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig

#: dense frontier matrices are (V × V)/conversation bools — cap V so a
#: single task stays ≤ ~3×16 MB; larger conversations take the generic
#: distributed path (which has no quadratic-memory term).
KERNEL_MAX_VERTICES = 4096


def _weights(radius: int) -> tuple[int, list[int]]:
    lcm = math.lcm(*range(1, radius + 1))
    return lcm, [lcm // d for d in range(1, radius + 1)]


def _out_schema(radius: int) -> str:
    cnts = ", ".join(f"cnt_d{d} int" for d in range(1, radius + 1))
    return f"vid long, {cnts}, harmonic double"


def harmonic_bounded(
    spark: SparkSession,
    edges: DataFrame,
    radius: int = 3,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Generic distributed path. ``edges`` = directed ``(src, dst)``;
    the graph is symmetrized and self-loops dropped.  Returns one row
    per non-isolated vertex: ``(vid, cnt_d1..cnt_dR, harmonic)``."""
    cfg = cfg or EngineConfig()
    lcm, w = _weights(radius)
    fwd = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition(cfg.shuffle_partitions, "src")
        .persist()
    )

    # level sets from every source at once; seen = self ∪ earlier levels
    frontier = sym.select(
        F.col("src").alias("s"), F.col("src").alias("v")
    ).distinct().localCheckpoint(eager=True)
    seen = frontier
    counts = []
    for d in range(1, radius + 1):
        nxt = (
            sym.join(frontier, sym.src == frontier.v)
            .select("s", F.col("dst").alias("v"))
            .distinct()
            .join(seen, ["s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        counts.append(
            nxt.groupBy("s").agg(
                F.count(F.lit(1)).cast("int").alias(f"cnt_d{d}")
            )
        )
        seen = seen.unionByName(nxt)
        frontier = nxt

    out = sym.select(F.col("src").alias("vid")).distinct()
    for c in counts:
        out = out.join(c, out.vid == c.s, "left").drop("s")
    cnt_cols = [
        F.coalesce(F.col(f"cnt_d{d}"), F.lit(0)).alias(f"cnt_d{d}")
        for d in range(1, radius + 1)
    ]
    units = None
    for d in range(1, radius + 1):
        term = F.coalesce(F.col(f"cnt_d{d}"), F.lit(0)).cast("long") * w[d - 1]
        units = term if units is None else units + term
    res = out.select(
        "vid", *cnt_cols, (units.cast("double") / F.lit(float(lcm))).alias("harmonic")
    )
    sym.unpersist()
    return res


def _harmonic_kernel_factory(radius: int):
    lcm, w = _weights(radius)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf["src"].to_numpy().astype(np.int64)
        dst = pdf["dst"].to_numpy().astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        n = len(nodes)
        ne = len(src)
        si, di = inv[:ne], inv[ne:]
        # symmetrize once; duplicates are harmless for boolean scatter
        es = np.concatenate([si, di])
        ed = np.concatenate([di, si])

        frontier = np.eye(n, dtype=bool)  # level-0 reach (self)
        seen = frontier.copy()
        cnts = np.zeros((radius, n), dtype=np.int64)
        units = np.zeros(n, dtype=np.int64)
        for d in range(1, radius + 1):
            nf = np.zeros((n, n), dtype=bool)
            np.logical_or.at(nf, (slice(None), ed), frontier[:, es])
            nf &= ~seen
            seen |= nf
            cnts[d - 1] = nf.sum(axis=1)
            units += w[d - 1] * cnts[d - 1]
            frontier = nf
        data = {"vid": nodes}
        for d in range(1, radius + 1):
            data[f"cnt_d{d}"] = cnts[d - 1].astype(np.int32)
        data["harmonic"] = units.astype(np.float64) / float(lcm)
        return pd.DataFrame(data)

    return kernel


def cascade_harmonic(
    spark: SparkSession,
    edges: DataFrame,
    radius: int = 3,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Cascade-local path. ``edges`` = ``(src, dst, conv_id)`` with
    vids unique per conversation (every derivation output satisfies
    this); distances are conversation-local, so one kernel pass is
    exact.  Oversized conversations run the generic distributed path
    over their edges only (union of vertex-disjoint results)."""
    cfg = cfg or EngineConfig()
    schema = _out_schema(radius)
    kernel = _harmonic_kernel_factory(radius)

    nv = (
        edges.select("conv_id", F.col("src").alias("vid"))
        .unionByName(edges.select("conv_id", F.col("dst").alias("vid")))
        .distinct()
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_v"))
    )
    big = nv.filter(F.col("n_v") > KERNEL_MAX_VERTICES).select("conv_id")
    rows = edges.select(
        "conv_id",
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    if big.isEmpty():
        return rows.groupBy("conv_id").applyInPandas(kernel, schema)
    local = (
        rows.join(F.broadcast(big), "conv_id", "left_anti")
        .groupBy("conv_id")
        .applyInPandas(kernel, schema)
    )
    residue = harmonic_bounded(
        spark,
        rows.join(F.broadcast(big), "conv_id", "left_semi").select("src", "dst"),
        radius,
        cfg,
    )
    return local.unionByName(residue)


def closeness_bounded(
    spark: SparkSession,
    edges: DataFrame,
    radius: int = 3,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Radius-bounded Wasserman–Faust closeness centrality, derived
    from the same exact integer level counts as ``harmonic_bounded``
    (one BFS sweep shared conceptually; here one call):

        C_WF(v) = (r/(n−1)) · (r/Σd)  =  r² / ((n−1)·Σd)

    with ``r`` = vertices reachable within ``radius`` (excluding
    ``v``), ``Σd`` = Σ_{d=1..R} d·n_d(v) the total bounded distance,
    and ``n`` = non-isolated vertex count.  The (r/(n−1)) factor is
    Wasserman & Faust's reachable-fraction correction — the standard
    fix that keeps closeness comparable on DISCONNECTED graphs (a
    conversation-partitioned influence graph is maximally
    disconnected), where raw closeness would reward tiny components.

    Cross-engine exactness: ``r``, ``Σd`` and ``(n−1)·Σd`` are BIGINT
    in both engines; the score is ONE IEEE division of two exact
    integers, so Spark and the DuckDB oracle agree bit-for-bit.

    Returns ``(vid, reach, totdist, closeness)``.  Scale shape: the
    BFS level sets (see ``harmonic_bounded``) plus one metadata-sized
    1-row broadcast for ``n`` — no driver-side data, no new shuffles
    beyond the shared level-set machinery.
    """
    h = harmonic_bounded(spark, edges, radius=radius, cfg=cfg)
    return closeness_from_counts(h, radius)


def closeness_cascade(
    spark: SparkSession,
    edges: DataFrame,
    radius: int = 3,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Closeness via the conversation-local kernel
    (``cascade_harmonic``'s vectorized per-conversation BFS — the fast
    path when edges never cross conversations, with the split-residue
    fallback for oversized ones).  Identical results to
    ``closeness_bounded``; ``edges`` must carry ``conv_id``."""
    h = cascade_harmonic(spark, edges, radius=radius, cfg=cfg)
    return closeness_from_counts(h, radius)


def closeness_from_counts(h: DataFrame, radius: int) -> DataFrame:
    """Derive ``(vid, reach, totdist, closeness)`` from a level-count
    table ``(vid, cnt_d1..cnt_dR, ...)`` — shared by both execution
    paths (and usable directly when harmonic and closeness are wanted
    off ONE BFS sweep)."""
    reach = sum(F.col(f"cnt_d{d}").cast("long") for d in range(1, radius + 1))
    tot = sum(
        (F.lit(d) * F.col(f"cnt_d{d}")).cast("long")
        for d in range(1, radius + 1)
    )
    base = h.select("vid", reach.alias("reach"), tot.alias("totdist"))
    n1 = base.agg((F.count(F.lit(1)) - F.lit(1)).cast("long").alias("_n1"))
    return base.crossJoin(F.broadcast(n1)).select(
        "vid",
        "reach",
        "totdist",
        F.when(
            (F.col("totdist") > 0) & (F.col("_n1") > 0),
            (F.col("reach") * F.col("reach")).cast("double")
            / (F.col("_n1") * F.col("totdist")).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("closeness"),
    )
