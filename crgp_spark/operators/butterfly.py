"""Butterfly (2×2-biclique) counting over the bipartite
conversation–participant membership graph — the bipartite analogue of
triangle counting, and the standard cohesion motif for two-mode
networks (Sanei-Mehri, Sariyüce & Tirthapura, KDD 2018 "Butterfly
Counting in Bipartite Networks"; Wang et al., VLDB 2019 vertex-priority
variant).  A butterfly is two participants co-appearing in the same two
conversations: the smallest unit of *repeated* co-engagement, which
separates systematic interaction from one-off co-occurrence — exactly
the signal a link-graph stack wants before trusting a projected edge
(``project.py::coparticipation`` counts shared conversations; this
counts the pairs-of-shared-conversations that make the projection
non-trivial).  The reference stops at per-conversation influence edges
(``reconstruct.rs:37-134``); this sits beside ``triangles.py`` and
``project.py`` in the motif family layered on the same membership
relation.

Semantics.  For membership M ⊆ K × V (group key × member), the
butterfly count of member ``v`` is

    b(v) = Σ_{w ≠ v} C(|N(v) ∩ N(w)|, 2)

(number of 2×2 bicliques containing ``v``), and the global count is
B = ½ Σ_v b(v) = Σ_{v<w} C(shared(v,w), 2).  Counting through the
OTHER side (pairs of groups sharing ≥2 members) yields the same B —
``tests/test_butterfly.py`` asserts that invariant.

Exactness: everything is BIGINT (pair counts, ``s·(s−1) div 2``
binomials, sums); no floats anywhere, so the DuckDB twin agrees
bit-for-bit.

Scale shape (100 TB): one map-side-combinable ``distinct`` on the
membership relation, then wedge generation = a self-equi-join on the
group key — fan-out is quadratic in GROUP size, not graph size, the
textbook projection blow-up.  Standard mitigations, all applied here:
(a) ``max_group_size`` drops mega-groups before pairing (they
contribute near-clique noise and dominate cost — same knob as
``project.py``); (b) the ``side`` parameter lets the caller pair
through whichever side has the cheaper Σ C(group,2) wedge budget (the
Sanei-Mehri side-selection rule — for conversation data the
conversation side is orders cheaper than hub participants);
(c) AQE's skew split handles residual imbalance on the group key.
Per-vertex aggregation is one partial-agg ``groupBy``.  No per-row
Python, no windows, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["butterfly_counts", "wedge_budget"]

_SIDES = {
    # side we COUNT butterflies for -> (group key, member value)
    "participant": ("conv_id", "participant"),
    "conv": ("participant", "conv_id"),
}


def wedge_budget(turns: DataFrame) -> DataFrame:
    """One row per pairing side with its wedge budget Σ C(size, 2) —
    the exact number of candidate pairs wedge generation will emit if
    pairing goes THROUGH that group key.  The caller picks the member
    side whose *opposite* key has the smaller budget (Sanei-Mehri
    side selection).  Two tiny aggregates, metadata-sized output."""
    pc = turns.select("conv_id", "participant").distinct()
    outs = []
    for side, (key, _val) in _SIDES.items():
        outs.append(
            pc.groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .agg(
                F.sum(F.expr("(n * (n - 1)) div 2")).alias("wedge_pairs")
            )
            .select(F.lit(side).alias("side"), "wedge_pairs")
        )
    return outs[0].unionByName(outs[1])


def butterfly_counts(
    turns: DataFrame,
    side: str = "participant",
    max_group_size: int | None = None,
) -> DataFrame:
    """Per-vertex butterfly counts for one side of the bipartite
    membership graph ``turns(conv_id, participant, ...)``.

    Returns ``(vid, n_mates, wedges, butterflies)`` where ``vid`` is
    named ``participant`` or ``conv_id`` per ``side``:

    - ``n_mates``      — distinct same-side vertices sharing ≥1 group,
    - ``wedges``       — Σ_w shared(v, w): paths of length 2 centred
      on the opposite side through ``v``,
    - ``butterflies``  — Σ_w C(shared(v, w), 2).

    ``max_group_size`` drops groups larger than the cap BEFORE pairing
    (see module docstring)."""
    if side not in _SIDES:
        raise ValueError(f"side must be one of {sorted(_SIDES)}, got {side!r}")
    key, val = _SIDES[side]
    m = (
        turns.select(F.col(key).alias("k"), F.col(val).alias("v"))
        .distinct()
    )
    if max_group_size is not None:
        small = (
            m.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= max_group_size)
            .select("k")
        )
        m = m.join(small.hint("shuffle_hash"), "k", "left_semi")

    left = m.select("k", F.col("v").alias("a"))
    right = m.select("k", F.col("v").alias("b"))
    pairs = (
        left.join(right, "k")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
    )
    # each unordered pair contributes to BOTH endpoints' per-vertex
    # rows — exploded in ONE pass (a union of two selects over `pairs`
    # would recompute the wedge self-join per branch; the explode keeps
    # the expensive join single-execution with no cache needed)
    both = pairs.select(
        F.explode(F.array("a", "b")).alias("vid"), "s"
    )
    return (
        both.groupBy("vid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_mates"),
            F.sum("s").cast("long").alias("wedges"),
            F.sum(F.expr("(s * (s - 1)) div 2")).cast("long").alias(
                "butterflies"
            ),
        )
        .withColumnRenamed("vid", val)
    )
