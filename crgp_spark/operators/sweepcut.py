"""PPR sweep cut (Andersen, Chung & Lang, FOCS 2006) — local community
detection over the influence graph: order vertices by personalized-
PageRank score over degree, sweep prefixes of that order, and report
each prefix's conductance.  The prefix minimizing conductance is the
ACL local cluster around the seed set — the standard local-clustering
primitive production graph systems run on exactly this kind of
reconstructed interaction graph.  The reference stops at influence
edges (``reconstruct.rs:37-134``); this composes with
``pagerank.py::personalized_pagerank`` the way ``ic_sim`` composes
with the components machinery.

Exactness: the sweep ordering key is ``score/deg`` computed as ONE
IEEE division of two exact integers (the 6-dp-quantized PPR score and
the undirected degree), ties broken by vid — deterministic
cross-engine.  Cut and volume are pure integers:

    vol(k) = Σ_{rk ≤ k} deg(v)               (cumulative window sum)
    int(k) = #{edges with BOTH endpoint ranks ≤ k}
    cut(k) = vol(k) − 2·int(k)
    φ(k)   = cut(k) / min(vol(k), 2m − vol(k))   (one IEEE division)

Scale shape (why this formulation): a naive sweep windows over EVERY
vertex globally — a single-partition sort at 100 TB.  Here the sweep
is restricted to the top-``k_max`` candidates (``TakeOrderedAndProject``
— the ACL cluster is small by design; k_max bounds output, not
correctness of the reported prefixes): degrees come from one
partial-agg groupBy, the internal-edge histogram touches only the
k_max×k_max candidate subgraph via a broadcast join of the k_max-row
rank map, and every window runs over ≤ k_max rows.  The 2m scalar
flows through a broadcast 1-row cross-join.  No global sort, no
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["sweep_cut"]


def sweep_cut(
    spark: SparkSession,
    edges: DataFrame,
    scores: DataFrame,
    k_max: int = 100,
) -> DataFrame:
    """Sweep the top-``k_max`` vertices of ``scores`` (``(vid, num)``,
    ``num`` an exact integer score) in ``num/deg`` order over the
    undirected graph of ``edges``; returns one row per prefix:
    ``(k, vid, vol, cut, conductance)``."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    keyed = scores.join(deg, "vid").select(
        "vid",
        "deg",
        (F.col("num").cast("double") / F.col("deg").cast("double")).alias(
            "_key"
        ),
    )
    top = keyed.orderBy(F.col("_key").desc(), F.col("vid").asc()).limit(
        k_max
    )
    w = Window.orderBy(F.col("_key").desc(), F.col("vid").asc())
    ranked = top.select(
        "vid", "deg", F.row_number().over(w).cast("long").alias("k")
    ).localCheckpoint(eager=True)

    # internal edges of the candidate subgraph: both endpoints ranked;
    # an edge becomes internal at prefix k = max(rank_a, rank_b)
    ra = ranked.select(F.col("vid").alias("a"), F.col("k").alias("ka"))
    rb = ranked.select(F.col("vid").alias("b"), F.col("k").alias("kb"))
    internal_at = (
        und.join(F.broadcast(ra), "a")
        .join(F.broadcast(rb), "b")
        .select(F.greatest("ka", "kb").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("_new_int"))
    )
    m2 = und.agg((F.count(F.lit(1)) * 2).cast("long").alias("_m2"))

    wk = Window.orderBy("k")
    curve = (
        ranked.join(internal_at, "k", "left")
        .select(
            "k",
            "vid",
            "deg",
            F.coalesce("_new_int", F.lit(0)).alias("_new_int"),
        )
        .select(
            "k",
            "vid",
            F.sum("deg").over(wk).cast("long").alias("vol"),
            F.sum("_new_int").over(wk).cast("long").alias("_int"),
        )
        .select(
            "k",
            "vid",
            "vol",
            (F.col("vol") - 2 * F.col("_int")).cast("long").alias("cut"),
        )
    )
    out = curve.crossJoin(F.broadcast(m2)).select(
        "k",
        "vid",
        "vol",
        "cut",
        F.when(
            F.least(F.col("vol"), F.col("_m2") - F.col("vol")) > 0,
            F.col("cut").cast("double")
            / F.least(F.col("vol"), F.col("_m2") - F.col("vol")).cast(
                "double"
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("conductance"),
    )
    und.unpersist()
    return out
