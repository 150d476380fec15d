"""Holland–Leinhardt triad census over a directed graph.

The 16-class census of all vertex triples — 003, 012, 102, 021D, 021U,
021C, 111D, 111U, 030T, 030C, 201, 120D, 120U, 120C, 210, 300 in the
standard M-A-N (mutual / asymmetric / null dyad) naming (Holland &
Leinhardt 1970; Wasserman & Faust ch. 14) — is THE classic structural
summary of a directed social graph: reciprocity, transitivity-vs-cycle
balance and hierarchy all read off it. The reference computes only
per-cascade edge counts (``statistics.rs:17-131``); triad censuses are
what its users run on the derived graph. Drawing convention for the
oriented classes (the one networkx's ``triadic_census`` documents):

    021D A←B→C   021U A→B←C   021C A→B→C
    111D A↔B←C   111U A↔B→C
    030T A→B←C, A→C          030C A←B←C, A→C
    120D 021D+A↔C  120U 021U+A↔C  120C 021C+A↔C
    210  201+one asym          300 all mutual

Algorithm (join-shaped, never O(n³)):

1. Dyads: one groupBy over the deduped edge set classifies every linked
   unordered pair as lo→hi / hi→lo / mutual.
2. Connected triads (≥2 linked dyads): expand each dyad to both
   endpoints and self-join on the shared vertex (``o1 < o2`` emits each
   dyad PAIR once); a triple with 3 linked dyads arrives 3 times —
   deduped by its sorted (i,j,k). Three dyad lookups rebuild the full
   base-4 state ``c_ij·16 + c_ik·4 + c_jk`` and a precomputed 64-entry
   isomorphism table names the class. Cost is Σ_v C(linked_deg(v), 2) —
   the triangle-enumeration bound; hub vertices are the usual skew case
   (AQE skew join / ``operators/skewjoin.py``).
3. Disconnected classes by exact integer identities, never enumerated:
   every linked dyad lies in (n−2) triples, so with Σm/Σa = mutual/asym
   dyad slots inside the enumerated triples,
   ``102 = M(n−2) − Σm``, ``012 = A(n−2) − Σa``, and
   ``003 = C(n,3) − (all 15 others)``. All BIGINT — exact while
   C(n,3) < 2^63, i.e. n ≲ 3.8M vertices; beyond that run
   ``include_disconnected=False`` (the 13 connected classes only, no
   n³ term — the disconnected counts are degenerate functions of
   (n, M, A) anyway at that scale).
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical class order (Wasserman & Faust table 14.1)
TRIAD_NAMES = (
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
)

_DYAD_ARCS = {0: (), 1: ((0, 1),), 2: ((1, 0),), 3: ((0, 1), (1, 0))}


def _classify(arcs: frozenset) -> str:
    """Name the triad class of an arc set over vertices {0,1,2} by its
    M-A-N signature + orientation invariants (isomorphism-invariant by
    construction — the tests additionally check all 6 relabelings)."""
    pairs = [(0, 1), (0, 2), (1, 2)]
    mut = [p for p in pairs if (p[0], p[1]) in arcs and (p[1], p[0]) in arcs]
    asym = [
        p
        for p in pairs
        if ((p[0], p[1]) in arcs) != ((p[1], p[0]) in arcs)
    ]
    m, a = len(mut), len(asym)
    aarcs = [
        arc
        for p in asym
        for arc in (p, (p[1], p[0]))
        if arc in arcs
    ]
    outd = {v: sum(1 for s, _ in aarcs if s == v) for v in range(3)}
    ind = {v: sum(1 for _, d in aarcs if d == v) for v in range(3)}
    if m == 0 and a == 0:
        return "003"
    if m == 0 and a == 1:
        return "012"
    if m == 1 and a == 0:
        return "102"
    if m == 0 and a == 2:
        if max(outd.values()) == 2:
            return "021D"
        if max(ind.values()) == 2:
            return "021U"
        return "021C"
    if m == 1 and a == 1:
        dyad = set(mut[0])
        (src, dst) = aarcs[0]
        return "111D" if dst in dyad else "111U"
    if m == 0 and a == 3:
        cyclic = all(outd[v] == 1 and ind[v] == 1 for v in range(3))
        return "030C" if cyclic else "030T"
    if m == 2 and a == 0:
        return "201"
    if m == 1 and a == 2:
        if max(outd.values()) == 2:
            return "120D"
        if max(ind.values()) == 2:
            return "120U"
        return "120C"
    if m == 2 and a == 1:
        return "210"
    return "300"


def _state_arcs(state: int) -> frozenset:
    """Arc set over {0,1,2} for base-4 state c01·16 + c02·4 + c12."""
    c01, c02, c12 = state // 16 % 4, state // 4 % 4, state % 4
    arcs = set(_DYAD_ARCS[c01])
    arcs |= {(0 if s == 0 else 2, 2 if d == 1 else 0) for s, d in _DYAD_ARCS[c02]}
    arcs |= {(s + 1, d + 1) for s, d in _DYAD_ARCS[c12]}
    return frozenset(arcs)


#: state -> class name for all 64 dyad-code combinations
TRIAD_STATE_CLASS = tuple(
    _classify(_state_arcs(s)) for s in range(64)
)


def _check_table() -> None:  # pragma: no cover - import-time invariant
    for state in range(64):
        base = _classify(_state_arcs(state))
        for perm in permutations(range(3)):
            relabeled = frozenset(
                (perm[s], perm[d]) for s, d in _state_arcs(state)
            )
            assert _classify(relabeled) == base, (state, perm)


def triad_census(
    edges: DataFrame, include_disconnected: bool = True
) -> DataFrame:
    """16-row (or 13-row) census ``(tclass, n_triads)`` of the directed
    graph given as an ``(src, dst)`` edge table (deduped, self-loops
    dropped defensively). Exact BIGINTs; see module doc for the n ≲ 3.8M
    bound on the disconnected classes."""
    spark = edges.sparkSession
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    dy = (
        e.groupBy(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .agg(
            F.max(
                F.when(F.col("src") < F.col("dst"), 1).otherwise(0)
            ).alias("f"),
            F.max(
                F.when(F.col("src") > F.col("dst"), 1).otherwise(0)
            ).alias("r"),
        )
        .select(
            "lo",
            "hi",
            F.when((F.col("f") == 1) & (F.col("r") == 1), 3)
            .when(F.col("f") == 1, 1)
            .otherwise(2)
            .alias("code"),
        )
    )
    half = dy.select(F.col("lo").alias("v"), F.col("hi").alias("o")).unionByName(
        dy.select(F.col("hi").alias("v"), F.col("lo").alias("o"))
    )
    p, q = half.alias("p"), half.alias("q")
    trip = (
        p.join(q, (F.col("p.v") == F.col("q.v")) & (F.col("p.o") < F.col("q.o")))
        .select(
            F.array_sort(
                F.array(F.col("p.v"), F.col("p.o"), F.col("q.o"))
            ).alias("t")
        )
        .select(
            F.col("t")[0].alias("i"),
            F.col("t")[1].alias("j"),
            F.col("t")[2].alias("k"),
        )
        .distinct()
    )
    d1, d2, d3 = dy.alias("d1"), dy.alias("d2"), dy.alias("d3")
    coded = (
        trip.join(
            d1,
            (F.col("i") == F.col("d1.lo")) & (F.col("j") == F.col("d1.hi")),
            "left",
        )
        .join(
            d2,
            (F.col("i") == F.col("d2.lo")) & (F.col("k") == F.col("d2.hi")),
            "left",
        )
        .join(
            d3,
            (F.col("j") == F.col("d3.lo")) & (F.col("k") == F.col("d3.hi")),
            "left",
        )
        .select(
            (
                F.coalesce(F.col("d1.code"), F.lit(0)) * 16
                + F.coalesce(F.col("d2.code"), F.lit(0)) * 4
                + F.coalesce(F.col("d3.code"), F.lit(0))
            ).alias("state")
        )
    )
    classes = F.array(*[F.lit(c) for c in TRIAD_STATE_CLASS])
    conn = (
        coded.groupBy(
            F.element_at(classes, F.col("state") + 1).alias("tclass")
        )
        .agg(F.count(F.lit(1)).alias("n_conn"))
    )
    spine = spark.createDataFrame(
        [(c,) for c in TRIAD_NAMES], "tclass string"
    )
    if not include_disconnected:
        spine = spine.filter(~F.col("tclass").isin("003", "012", "102"))
        return spine.join(conn, "tclass", "left").select(
            "tclass",
            F.coalesce(F.col("n_conn"), F.lit(0)).cast("long").alias("n_triads"),
        )
    # scalar identities for the 3 disconnected classes: 1-row aggregates
    # folded broadcast-side (the engine's no-collect scalar shape)
    is_m = (F.col("state") % 4 == 3).cast("long") + (
        (F.col("state") / 4).cast("long") % 4 == 3
    ).cast("long") + ((F.col("state") / 16).cast("long") % 4 == 3).cast("long")
    is_a = (
        F.col("state") % 4).isin(1, 2).cast("long") + (
        (F.col("state") / 4).cast("long") % 4
    ).isin(1, 2).cast("long") + (
        (F.col("state") / 16).cast("long") % 4
    ).isin(1, 2).cast("long")
    tstats = coded.agg(
        F.count(F.lit(1)).alias("ct"),
        F.coalesce(F.sum(is_m), F.lit(0)).alias("summ"),
        F.coalesce(F.sum(is_a), F.lit(0)).alias("suma"),
    )
    dystats = dy.agg(
        F.count(F.when(F.col("code") == 3, 1)).alias("mm"),
        F.count(F.when(F.col("code") != 3, 1)).alias("aa"),
    )
    nverts = (
        e.select(F.col("src").alias("u"))
        .unionByName(e.select(F.col("dst").alias("u")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scal = nverts.crossJoin(F.broadcast(dystats)).crossJoin(
        F.broadcast(tstats)
    )
    c102 = F.col("mm") * (F.col("n") - 2) - F.col("summ")
    c012 = F.col("aa") * (F.col("n") - 2) - F.col("suma")
    call = F.expr("n * (n - 1) * (n - 2) div 6")
    disc = scal.select(
        F.lit("102").alias("tclass"), c102.cast("long").alias("n_disc")
    ).unionByName(
        scal.select(
            F.lit("012").alias("tclass"), c012.cast("long").alias("n_disc")
        )
    ).unionByName(
        scal.select(
            F.lit("003").alias("tclass"),
            (call - F.col("ct") - c102 - c012).cast("long").alias("n_disc"),
        )
    )
    return (
        spine.join(conn, "tclass", "left")
        .join(disc, "tclass", "left")
        .select(
            "tclass",
            F.coalesce(F.col("n_conn"), F.col("n_disc"), F.lit(0))
            .cast("long")
            .alias("n_triads"),
        )
    )
