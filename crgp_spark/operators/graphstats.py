"""Graph summary statistics over an edge table.

The reference's statistics operator (``statistics.rs:17-131``) reports
scalar load/derive counters; the structural companion its users compute
downstream is the degree distribution — the first thing anyone asks of
a new graph, and the input to skew decisions (hub thresholds, salting
factors — ``operators/pack.py`` / ``cascade.py`` pick their split
points from exactly these counts).

Scale shape: two map-side-combinable aggregations (per-vertex count,
then per-degree count) — the same plan at any scale; no windows, no
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Out-degree histogram ``(out_deg, n_vertices)`` over the vertex
    universe (src ∪ dst) — vertices with no out-edges land in the 0
    bucket via the left join, mirroring ``customer_order_distribution``'s
    outer-join-then-count shape on the warehouse side."""
    verts = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    deg = edges.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("_d")
    )
    return (
        verts.join(deg, "vid", "left")
        .select(F.coalesce("_d", F.lit(0)).alias("out_deg"))
        .groupBy("out_deg")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def clustering_coefficient(spark, edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over the undirected
    simple graph: ``coeff = 2·triangles / (degree·(degree−1))``
    (0 where degree < 2), with the distinct-neighbor degree.

    Composes the degree-oriented triangle counter with one
    distinct-neighbor aggregate — the standard cohesion metric next to
    the degree histogram.  The coefficient divides two exact integers,
    so the floor-rounded 6dp output is engine-independent.  Returns
    ``(vid, degree, triangles, coeff)``."""
    from crgp_spark.operators.triangles import triangles as _tri

    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbrs = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = nbrs.groupBy(F.col("a").alias("vid")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    _total, per_vertex = _tri(spark, edges)
    coeff = F.when(
        F.col("degree") >= 2,
        F.lit(2.0)
        * F.col("triangles").cast("double")
        / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return deg.join(per_vertex, "vid", "left").select(
        "vid",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        (F.floor(coeff * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("coeff"),
    )


def graph_summary(edges: DataFrame) -> DataFrame:
    """One-row structural summary of the undirected simple graph:
    ``(n_vertices, n_edges, max_deg, density, avg_deg, assortativity)``.

    Degree assortativity (Newman 2002) is computed from INTEGER moments
    over the directed orientation list — M, Σx, Σx², Σxy are exact
    BIGINT sums (map-side combinable), and the only float ops are the
    two final divisions, so the result is bit-identical in any engine
    and independent of partitioning/summation order.  At 100 TB the
    same plan holds; the BIGINT moments overflow only past ~3·10^9
    edge-endpoints × 10^4-degree hubs — switch the two product sums to
    DECIMAL(38,0) there, same shape.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    both = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("u").alias("_su"), F.col("d").alias("dx"))
    dv = deg.select(F.col("u").alias("_sv"), F.col("d").alias("dy"))
    pairs = (
        both.join(du, both["u"] == du["_su"])
        .join(dv, both["v"] == dv["_sv"])
        .select("dx", "dy")
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("M"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.max("dx").alias("max_deg"),
    )
    nv = deg.agg(F.count(F.lit(1)).alias("n_vertices"))
    num = F.col("M") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("M") * F.col("sxx") - F.col("sx") * F.col("sx")
    from crgp_spark.functions import decimal_round

    return (
        m.crossJoin(F.broadcast(nv))
        .select(
            "n_vertices",
            (F.col("M") / 2).cast("long").alias("n_edges"),
            F.col("max_deg").cast("int").alias("max_deg"),
            decimal_round(
                F.col("M").cast("double")
                / (
                    F.col("n_vertices").cast("double")
                    * (F.col("n_vertices") - 1).cast("double")
                ),
                6,
            ).alias("density"),
            decimal_round(
                F.col("M").cast("double") / F.col("n_vertices").cast("double"),
                6,
            ).alias("avg_deg"),
            decimal_round(
                num.cast("double") / den.cast("double"), 6
            ).alias("assortativity"),
        )
    )


def mixing_stats(edges: DataFrame) -> DataFrame:
    """One-row DIRECTED mixing summary over ``(src, dst)``:
    ``(n_edges, n_mutual, reciprocity, assortativity)``.

    Reciprocity = fraction of directed edges whose reverse also exists
    (Garlaschelli & Loffredo 2004) — the "do successions flow back?"
    question ``graph_summary``'s undirected view erases. Directed
    degree assortativity is the Newman 2002 Pearson correlation of
    (out-degree of src, in-degree of dst) over edges.

    Exactness contract (the ``graph_summary`` precedent): every moment
    — M, mutual count, Σx, Σy, Σx², Σy², Σxy — is an exact BIGINT in
    ONE map-side-combinable aggregate; the only float ops are the final
    division, multiply and sqrt on already-exact operands, IEEE-
    identical cross-engine. BIGINT moments overflow only past ~3·10^9
    edges × 10^4-degree hubs — switch the product sums to DECIMAL(38,0)
    there, same shape. NULL assortativity when a degree is constant
    (zero variance), mirroring the oracle's NULLIF."""
    from crgp_spark.functions import decimal_round

    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).withColumn("_m", F.lit(1))
    dout = e.groupBy("src").agg(F.count(F.lit(1)).alias("dx"))
    din = e.groupBy("dst").agg(F.count(F.lit(1)).alias("dy"))
    pairs = (
        e.join(rev, ["src", "dst"], "left")
        .join(dout, "src")
        .join(din, "dst")
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("M"),
        F.sum(F.coalesce("_m", F.lit(0))).alias("mutual"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    num = F.col("M") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("M") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("M") * F.col("syy") - F.col("sy") * F.col("sy")
    den = F.sqrt(denx.cast("double") * deny.cast("double"))
    return m.select(
        F.col("M").cast("long").alias("n_edges"),
        F.col("mutual").cast("long").alias("n_mutual"),
        decimal_round(
            F.col("mutual").cast("double") / F.col("M").cast("double"), 6
        ).alias("reciprocity"),
        decimal_round(
            num.cast("double")
            / F.when(den > 0, den).otherwise(F.lit(None)),
            6,
        ).alias("assortativity"),
    )


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity Q of a given vertex partition over the
    undirected simple graph — the community-QUALITY metric that scores
    any clustering (label propagation, components, a hash partition):
    ``Q = Σ_c [e_c/M − (d_c/(2M))²]``.

    ``labels`` is ``(vid, label)``; unlabeled vertices default to their
    own singleton community (coalesce to vid — harmless: a singleton
    only contributes its −(d/2M)² term, exactly as Newman defines it).

    Exact-rational shape: ``Q·4M² = 4M·E_intra − Σ_c d_c²`` — both
    sides BIGINT from two combinable aggregates (intra-edge count;
    per-community degree sums then one squared-sum fold), returned as
    ``(m_edges, intra_edges, q_num, q_den, modularity)`` with the one
    float division last (`decimal_round` 6dp). Overflow envelope:
    ``d_c² ≤ 4M²`` needs M < 1.5·10^9 in BIGINT — DECIMAL(38,0) past
    that, same plan."""
    from crgp_spark.functions import decimal_round

    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    lab_u = labels.select(F.col("vid").alias("u"), F.col("label").alias("cu"))
    lab_v = labels.select(F.col("vid").alias("v"), F.col("label").alias("cv"))
    tagged = (
        und.join(lab_u, "u", "left")
        .join(lab_v, "v", "left")
        .select(
            "u",
            "v",
            F.coalesce("cu", F.col("u")).alias("cu"),
            F.coalesce("cv", F.col("v")).alias("cv"),
        )
    )
    totals = tagged.agg(
        F.count(F.lit(1)).alias("M"),
        F.sum((F.col("cu") == F.col("cv")).cast("long")).alias("intra"),
    )
    # per-community degree mass: both endpoint directions, one groupBy
    dc = (
        tagged.select(F.col("cu").alias("c"))
        .unionByName(tagged.select(F.col("cv").alias("c")))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * F.col("d")).alias("sum_dc2"))
    )
    q_num = (
        F.lit(4) * F.col("M") * F.col("intra")
        - F.col("sum_dc2")
    )
    q_den = F.lit(4) * F.col("M") * F.col("M")
    return totals.crossJoin(F.broadcast(dc)).select(
        F.col("M").cast("long").alias("m_edges"),
        F.col("intra").cast("long").alias("intra_edges"),
        q_num.cast("long").alias("q_num"),
        q_den.cast("long").alias("q_den"),
        decimal_round(
            q_num.cast("double") / q_den.cast("double"), 6
        ).alias("modularity"),
    )


def edge_jaccard(edges: DataFrame) -> DataFrame:
    """Neighborhood Jaccard per undirected edge: ``(u, v, common,
    deg_u, deg_v, jaccard)`` with ``common`` the edge's triangle
    support (|N(u) ∩ N(v)|) and ``jaccard = common / (deg_u + deg_v −
    2 − common)`` — the local-similarity weight behind structural
    sparsification and Jarvis-Patrick clustering; ``jaccard = 0`` with
    ``common = 0`` marks a LOCAL BRIDGE (endpoints share nothing).

    Exactness: counts are exact integers and jaccard is one IEEE
    division (isolated edges — both endpoints degree 1 — define 0.0).
    Scale shape: the degree-oriented wedge join from the triangle
    family (`ktruss.edge_support`) + one degree recombine — never an
    all-pairs neighborhood materialization."""
    from crgp_spark.operators.ktruss import edge_support

    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nb = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = nb.groupBy(F.col("u").alias("vid")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    sup = edge_support(und)
    both = (
        sup.join(
            deg.withColumnsRenamed({"vid": "u", "deg": "deg_u"}).hint(
                "shuffle_hash"
            ),
            "u",
        )
        .join(
            deg.withColumnsRenamed({"vid": "v", "deg": "deg_v"}).hint(
                "shuffle_hash"
            ),
            "v",
        )
    )
    denom = F.col("deg_u") + F.col("deg_v") - 2 - F.col("common")
    return both.select(
        "u",
        "v",
        F.col("support").cast("long").alias("common"),
        F.col("deg_u").cast("long").alias("deg_u"),
        F.col("deg_v").cast("long").alias("deg_v"),
        F.when(
            denom > 0,
            F.col("support").cast("double") / denom.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )


def sparsify_topk(ej: DataFrame, k: int) -> DataFrame:
    """Local graph sparsification (Satuluri-Parthasarathy style, fixed
    k): keep an edge iff it ranks in EITHER endpoint's top-``k`` by
    neighborhood Jaccard (ties: higher common, then smaller neighbor
    id).  Input = `edge_jaccard` output; returns the kept subset, same
    columns.  Per-vertex WindowGroupLimit — partitioned top-k, no
    global sort; the similarity-weighted backbone that preserves
    communities while dropping noise edges at 100 TB scale."""
    if k < 1:
        raise ValueError("k must be >= 1")
    half = ej.select(
        F.col("u").alias("x"), F.col("v").alias("y"), "common", "jaccard"
    ).unionByName(
        ej.select(
            F.col("v").alias("x"), F.col("u").alias("y"), "common", "jaccard"
        )
    )
    w = Window.partitionBy("x").orderBy(
        F.col("jaccard").desc(), F.col("common").desc(), F.col("y").asc()
    )
    kept = (
        half.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
        )
        .distinct()
    )
    return ej.join(kept, ["u", "v"], "left_semi")


def scan_statistic(spark, edges: DataFrame) -> DataFrame:
    """Ego-net scan statistic (Priebe et al. 2005 "scan statistics on
    Enron graphs"): per vertex, the edge count of the induced CLOSED
    1-hop neighborhood —

        scan1(v) = deg(v) + tri(v)

    since every ego-net edge is either incident to ``v`` (deg) or an
    edge between two neighbors, i.e. a triangle through ``v``. Returns
    ``(vid, deg, triangles, scan1)`` for every vertex of the
    undirected simple graph; large ``scan1`` relative to degree flags
    locally-dense "chatter" anomalies.

    Cost = one exact triangle pass (degeneracy-oriented wedge join,
    ``triangles.py``) plus a degree aggregate — no new join shapes, so
    the 100 TB posture is inherited from the triangle operator.
    Reference has no ego-net surface; this is the standard anomaly
    readout users run on its derived influence graphs."""
    from crgp_spark.operators.triangles import _undirected, triangles

    und = _undirected(edges)
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    _total, per_vertex = triangles(spark, edges)
    return (
        deg.join(per_vertex.hint("shuffle_hash"), "vid")
        .select(
            "vid",
            "deg",
            "triangles",
            (F.col("deg") + F.col("triangles")).alias("scan1"),
        )
    )


def powerlaw_alpha(edges: DataFrame, d_min: int = 2) -> DataFrame:
    """Discrete power-law exponent MLE (Clauset-Shalizi-Newman 2009 /
    Hill estimator) over the symmetrized degree distribution's tail
    ``deg ≥ d_min``:

        alpha = 1 + n_tail / Σ ln(deg_i / d_min)

    On the quantized-ln contract: ``denom_scaled = Σ (lnq(deg) −
    lnq(d_min))`` is an exact BIGINT, and ``alpha`` is one pinned
    float expression — the "is this graph scale-free, and how heavy is
    the hub tail" readout that decides whether the salted-hub
    machinery (``pack.py``, ``cascade.py`` replicas) is load-bearing
    for a given edge table. Returns one row ``(n_tail, d_min,
    denom_scaled, alpha)``; ``alpha`` 0.0 when the tail is empty or
    degenerate (every tail degree equals ``d_min``)."""
    from crgp_spark.operators.textstats import _lnq

    if d_min < 1:
        raise ValueError("d_min must be >= 1")
    und = _undirected_pairs(edges)
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= d_min)
    )
    g = deg.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(_lnq(F.col("deg")) - F.lit(_lnq_int(d_min)))
        .cast("long")
        .alias("denom_scaled"),
    )
    alpha = F.when(
        F.col("denom_scaled") > 0,
        F.lit(1.0)
        + F.col("n_tail").cast("double")
        * F.lit(1e6)
        / F.col("denom_scaled").cast("double"),
    ).otherwise(F.lit(0.0))
    from crgp_spark.functions import decimal_round

    return g.select(
        F.coalesce("n_tail", F.lit(0)).alias("n_tail"),
        F.lit(d_min).cast("long").alias("d_min"),
        F.coalesce("denom_scaled", F.lit(0)).alias("denom_scaled"),
        decimal_round(alpha, 6).alias("alpha"),
    )


def _lnq_int(x: int, scale: int = 1_000_000) -> int:
    """Python-side ``_lnq`` of a constant (embedded as a literal so
    the oracle can embed the identical integer)."""
    import math

    return math.floor(math.log(x) * scale + 0.5)


def _undirected_pairs(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
