"""Neighborhood-based link prediction: common-neighbor, Jaccard and
Adamic–Adar scores for vertex pairs not yet connected — north-rule
extension (the reference reconstructs the influence graph; this ranks
the edges it predicts should appear next, the classic companion query
on any link graph: Liben-Nowell & Kleinberg 2003).

Semantics: neighborhoods are UNDIRECTED distinct neighbor sets with
self-loops dropped. For every pair ``(a, b)``, ``a < b``, that shares
at least ``min_common`` neighbors and is not itself an edge:

* ``common``      — |N(a) ∩ N(b)| (exact integer);
* ``jaccard``     — common / |N(a) ∪ N(b)| (4dp, integer-derived);
* ``adamic_adar`` — Σ_{z ∈ N(a) ∩ N(b)} 1/ln(deg z)  (6dp; every
  shared neighbor has deg ≥ 2 so ln never hits zero).

Scale shape: candidate pairs come from one wedge self-join of the
undirected adjacency on the shared endpoint — the same join family as
triangle counting, except wedges cannot be degree-oriented away (both
directions of every wedge are genuine candidates), so a hub of degree
d genuinely owns O(d²) candidate pairs.  That is a property of the
QUERY, not the plan; the standard mitigations are both here:

* ``max_degree`` prunes hub wedge-centers before the self-join (the
  usual practice — super-hub co-neighborship carries no signal, and
  it bounds fan-out by ``max_degree``·|E| exactly like the
  degeneracy bound in triangles.py); ``None`` keeps exact semantics
  for oracle comparison at test scale.
* The self-join is an equi-join on the center vertex, so AQE's
  skew-join split handles residual imbalance.

All joins carry ``shuffle_hash`` hints for the same bounded-heap
reason as triangles.py (|V|-sized tables under a generous broadcast
threshold).  No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round


def _undirected_adj(edges: DataFrame) -> DataFrame:
    """Distinct undirected adjacency (v, n): both directions, no loops."""
    return (
        edges.select(F.col("src").alias("v"), F.col("dst").alias("n"))
        .unionByName(
            edges.select(F.col("dst").alias("v"), F.col("src").alias("n"))
        )
        .filter(F.col("v") != F.col("n"))
        .distinct()
    )


def link_prediction(
    edges: DataFrame,
    min_common: int = 2,
    max_degree: int | None = None,
) -> DataFrame:
    """(a, b, common, jaccard, adamic_adar) for unconnected pairs with
    ``common >= min_common``; see module docstring for semantics."""
    adj = _undirected_adj(edges)
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))

    # a wedge center needs >= 2 neighbors; dropping deg-1 vertices here
    # also keeps 1/ln(deg) away from ln(1)=0 under ANSI mode
    centers = adj.join(deg.hint("shuffle_hash"), "v").filter(F.col("deg") >= 2)
    if max_degree is not None:
        centers = centers.filter(F.col("deg") <= max_degree)

    # wedges through shared neighbor z: (z, a), (z, b) with a < b.
    # 1/ln(deg z) is attached BEFORE the self-join so the aggregate
    # needs no second degree lookup.
    zside = centers.select(
        F.col("v").alias("z"),
        F.col("n").alias("endpoint"),
        (F.lit(1.0) / F.log(F.col("deg").cast("double"))).alias("w"),
    )
    pairs = (
        zside.alias("l")
        .join(
            zside.alias("r").drop("w").hint("shuffle_hash"),
            (F.col("l.z") == F.col("r.z"))
            & (F.col("l.endpoint") < F.col("r.endpoint")),
        )
        .select(
            F.col("l.endpoint").alias("a"),
            F.col("r.endpoint").alias("b"),
            F.col("l.w").alias("w"),
        )
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum("w").alias("_aa"),
        )
        .filter(F.col("common") >= min_common)
    )

    # drop pairs that are already edges (link prediction ranks NEW links)
    existing = adj.filter(F.col("v") < F.col("n")).withColumnsRenamed(
        {"v": "a", "n": "b"}
    )
    new_pairs = pairs.join(existing.hint("shuffle_hash"), ["a", "b"], "left_anti")

    deg_a = deg.withColumnsRenamed({"v": "a", "deg": "deg_a"}).hint(
        "shuffle_hash"
    )
    deg_b = deg.withColumnsRenamed({"v": "b", "deg": "deg_b"}).hint(
        "shuffle_hash"
    )
    return (
        new_pairs.join(deg_a, "a")
        .join(deg_b, "b")
        .select(
            "a",
            "b",
            F.col("common").cast("int").alias("common"),
            decimal_round(
                F.col("common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")),
                4,
            ).alias("jaccard"),
            decimal_round(F.col("_aa"), 6).alias("adamic_adar"),
        )
    )


def top_predicted_links(
    edges: DataFrame,
    k: int = 100,
    min_common: int = 2,
    max_degree: int | None = None,
) -> DataFrame:
    """Global top-``k`` predicted links as (rk, a, b, common, jaccard,
    adamic_adar).  The ranking key is integer-derived throughout
    (common, then 4dp-floored jaccard, then (a, b)) so the order is
    bit-identical across engines — adamic_adar is reported but kept
    OUT of the key because parallel float summation order is not.
    The rank-limit window compiles to partial/final ``WindowGroupLimit``
    (each task keeps only its top-k before the single-partition final),
    the same top-k shape as ngram_topk."""
    scored = link_prediction(edges, min_common=min_common, max_degree=max_degree)
    w = Window.orderBy(
        F.col("common").desc(), F.col("jaccard").desc(), F.col("a"), F.col("b")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("rk", "a", "b", "common", "jaccard", "adamic_adar")
    )
