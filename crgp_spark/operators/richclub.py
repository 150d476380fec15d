"""Rich-club coefficient curve of an undirected graph.

φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k = vertices of degree > k and
E_k = edges with BOTH endpoints of degree > k (Zhou & Mondragón 2004)
— "do the hubs preferentially link to each other?", the standard
complement to the degree-mixing stats in ``operators/graphstats.py``.

Shape: never a per-k loop. Each edge's survival threshold is
``min(deg_u, deg_v)`` and each vertex's is its degree, so the whole
curve is two tiny histograms (groupBy degree / groupBy min-endpoint
degree) suffix-summed with one window over the DISTINCT degree values —
O(distinct degrees) rows after two scan-shaped joins, any graph size.
Counts are exact BIGINTs; φ is the single engine-stable IEEE division,
floor-rounded to 6 dp like the engine's other ratio outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rich_club(edges: DataFrame) -> DataFrame:
    """``(k, n_rich, e_rich, phi)`` for every observed degree k
    (direction/duplicates ignored, self-loops dropped; φ NULL when
    fewer than two vertices qualify)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    both = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # vertex survival histogram: N_k = #vertices with deg > k
    vhist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("nv"))
    # edge survival histogram keyed by min endpoint degree
    du = deg.select(F.col("u").alias("eu"), F.col("deg").alias("du"))
    dv = deg.select(F.col("u").alias("ev"), F.col("deg").alias("dv"))
    em = (
        und.join(du, und["u"] == du["eu"])
        .join(dv, und["v"] == dv["ev"])
        .select(F.least("du", "dv").alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    # suffix sums over the distinct-degree spine (tiny): rows with
    # threshold value STRICTLY greater than k survive at k
    spine = vhist.select(F.col("deg").alias("k"))
    wk = Window.orderBy(F.desc("k")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # order vertices' histogram descending; at each k the survivors are
    # the strictly-greater buckets = the window EXCLUDING current row
    n_rich = (
        spine.join(vhist, spine["k"] == vhist["deg"], "left")
        .select("k", F.coalesce("nv", F.lit(0)).alias("nv"))
        .withColumn(
            "n_rich", F.coalesce(F.sum("nv").over(wk), F.lit(0)).cast("long")
        )
        .select("k", "n_rich")
    )
    e_rich = (
        spine.join(em, spine["k"] == em["m"], "left")
        .select("k", F.coalesce("ne", F.lit(0)).alias("ne"))
        .withColumn(
            "e_rich", F.coalesce(F.sum("ne").over(wk), F.lit(0)).cast("long")
        )
        .select(F.col("k").alias("k2"), "e_rich")
    )
    out = n_rich.join(e_rich, n_rich["k"] == e_rich["k2"]).select(
        "k", "n_rich", "e_rich"
    )
    phi = F.when(
        F.col("n_rich") >= 2,
        F.floor(
            F.lit(2_000_000) * F.col("e_rich")
            / (F.col("n_rich") * (F.col("n_rich") - 1))
            + F.lit(0.5)
        )
        / F.lit(1_000_000.0),
    )
    return out.withColumn("phi", phi)
