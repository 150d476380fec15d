"""Approximate neighborhood function (ANF) — Flajolet-Martin bitmask
propagation (Palmer/Gibbons/Faloutsos KDD'02; Boldi/Rosa/Vigna
HyperANF WWW'11).

The neighborhood function ``N(h)`` — how many vertices are within
``h`` hops of each vertex, and in total — is the scale-out way to ask
"how connected is this link graph" without computing all-pairs
distances (exact BFS per vertex is O(|V|·|E|); the family here —
harmonic.py, betweenness.py — bounds it by sampling seeds). ANF
answers it for EVERY vertex in ``hops`` supersteps: each vertex
carries ``registers`` fixed-width Flajolet-Martin bitmasks, and
"reachable set grew" is "bitwise OR of neighbor masks" — a
commutative-monoid message, so every superstep is one
map-side-combinable ``BIT_OR`` shuffle, state stays |V| rows of
``registers`` BIGINTs, and the answer costs the same whether the
reachable sets hold ten vertices or ten billion. This is the exact
shape HyperANF runs at web scale; per-vertex output feeds hub/spam
detection (abnormally large 2-hop balls) and curve output gives the
effective-diameter report.

Determinism (the walks.py/mis.py idiom): register ``j`` of vertex
``v`` seeds bit ``k = tz(md5_num60(v || ':' || j))`` capped at
``max_bit`` — a pure function of the input, so retried partitions and
the DuckDB oracle reproduce bit-for-bit. The mask/bit math is pure
integer (mod ladders, ``|``, ``BIT_OR``), so cross-engine comparison
is exact with no float tolerance anywhere; estimates (``2^b / .77351``)
are exposed separately via :func:`nf_estimate` and deliberately kept
out of the gated integer surface.

Superstep shape (reference epoch loop ``run.rs:118-129``; adjacency
``graph.rs:17-22``): messages = ``edges ⋈ state`` on ``dst`` +
``groupBy(src).BIT_OR`` (partial aggregation: OR is idempotent and
commutative, the best case for map-side combine); merge = LEFT join
state with messages + per-register ``m | COALESCE(msg, 0)``. The merge
joins state with a state-derived table, so per the CLAUDE.md
inherited-stats rule every checkpoint is wrapped in
``plans/superstep.reset_stats``; state joins follow the shared
``state_hint`` broadcast policy. ``hops`` supersteps exactly — no
convergence probe needed (the curve is the product, not a fixpoint),
so the loop runs ZERO driver-side actions until the caller's own
action, and per-hop curve rows stay lazy unions over the (few, all
retained) per-hop checkpoints.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.functions import md5_num60
from crgp_spark.plans.superstep import reset_stats, state_hint


def _seed_mask(vid: Column, j: int, max_bit: int) -> Column:
    """FM seed mask for register ``j``: single bit at
    ``min(trailing_zeros(hash), max_bit)`` — P(bit k) = 2^-(k+1),
    geometric, via pure integer mod (no float, no bit intrinsics;
    SQL twin ``_sql_anf_parts``)."""
    h = md5_num60(F.concat_ws(":", vid.cast("string"), F.lit(str(j))))
    expr = F.lit(1 << max_bit).cast("long")  # tz >= max_bit, incl. h = 0
    for k in range(max_bit - 1, -1, -1):
        expr = F.when(h % (1 << (k + 1)) == (1 << k), F.lit(1 << k)).otherwise(
            expr
        )
    return expr


def _lowest_unset(m: Column, max_bit: int) -> Column:
    """Position of the lowest ZERO bit of ``m`` (the FM observable
    ``R``): ``b = k`` iff ``m mod 2^(k+1) = 2^k - 1`` — again a pure
    integer mod ladder shared verbatim with the oracle."""
    expr = F.lit(max_bit + 1)  # bits 0..max_bit all set
    for k in range(max_bit, -1, -1):
        expr = F.when(m % (1 << (k + 1)) == (1 << k) - 1, F.lit(k)).otherwise(
            expr
        )
    return expr


def _anf_states(
    spark: SparkSession,
    edges: DataFrame,
    hops: int,
    registers: int,
    max_bit: int,
    cfg: EngineConfig,
) -> list[DataFrame]:
    """Run the propagation; returns the per-hop states
    ``[state_1, ..., state_hops]``, each ``(vid, m0..m{R-1})``
    checkpointed (all retained — ``hops`` is small by design; callers
    hold lazy references into them)."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(cfg.shuffle_partitions, "dst")
        .localCheckpoint(eager=True)
    )
    mcols = [f"m{j}" for j in range(registers)]
    state = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
        .select(
            "vid",
            *[
                _seed_mask(F.col("vid"), j, max_bit).alias(mcols[j])
                for j in range(registers)
            ],
        )
        .localCheckpoint(eager=True)
    )
    n_verts = state.count()  # one metadata action, sizes state_hint
    out: list[DataFrame] = []
    for _hop in range(1, hops + 1):
        msgs = (
            e.join(
                state_hint(
                    state.select(F.col("vid").alias("dst"), *mcols), n_verts
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("vid"))
            .agg(*[F.bit_or(c).alias(f"b_{c}") for c in mcols])
        )
        state = reset_stats(
            state.join(state_hint(msgs, n_verts), "vid", "left")
            .select(
                "vid",
                *[
                    F.col(c)
                    .bitwiseOR(F.coalesce(F.col(f"b_{c}"), F.lit(0)))
                    .alias(c)
                    for c in mcols
                ],
            )
            .localCheckpoint(eager=True)
        )
        out.append(state)
    return out


def _bsum(registers: int, max_bit: int) -> Column:
    return reduce(
        lambda a, b: a + b,
        [_lowest_unset(F.col(f"m{j}"), max_bit) for j in range(registers)],
    ).cast("long")


def anf(
    spark: SparkSession,
    edges: DataFrame,
    hops: int = 3,
    registers: int = 4,
    max_bit: int = 20,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Global neighborhood-function curve: one row per hop ``h`` —
    ``(hop, n_verts, sum_b)`` where ``sum_b`` is the summed
    lowest-unset-bit observable over all vertices and registers at
    hop ``h``. ``nf_estimate`` turns ``sum_b`` into the standard FM
    size estimate; the gated surface stays pure-integer."""
    cfg = cfg or EngineConfig()
    states = _anf_states(spark, edges, hops, registers, max_bit, cfg)
    rows = [
        s.agg(
            F.lit(h).cast("int").alias("hop"),
            F.count(F.lit(1)).alias("n_verts"),
            F.sum(_bsum(registers, max_bit)).alias("sum_b"),
        )
        for h, s in enumerate(states, start=1)
    ]
    return reduce(lambda a, b: a.unionByName(b), rows)


def anf_vertices(
    spark: SparkSession,
    edges: DataFrame,
    hops: int = 3,
    registers: int = 4,
    max_bit: int = 20,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Per-vertex FM observable at the final hop: ``(vid, b_sum)``
    — ``b_sum / registers`` is ``log2`` of the vertex's ``hops``-hop
    reachable-set size (up to the FM constant); the per-vertex feed
    for hub/anomaly detection."""
    cfg = cfg or EngineConfig()
    state = _anf_states(spark, edges, hops, registers, max_bit, cfg)[-1]
    return state.select(
        "vid", _bsum(registers, max_bit).alias("b_sum")
    )


#: Flajolet-Martin bias correction constant (Flajolet & Martin 1985).
FM_PHI = 0.77351


def nf_estimate(sum_b: float, n_verts: int, registers: int) -> float:
    """Driver-side estimate of the average ``hops``-hop ball size from
    a curve row: ``2^(sum_b / (n·R)) / φ``. Kept out of the gated
    integer surface (cross-engine ``pow`` is not bit-stable)."""
    return 2.0 ** (sum_b / (n_verts * registers)) / FM_PHI
