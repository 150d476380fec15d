"""Deterministic synthetic transcript generator — pure Spark expressions.

All "randomness" is ``xxhash64(seed, ...)`` of the row's natural key, so
the data is bit-identical across runs, partitionings and parallelism
levels (no RNG state, no wall clock), and generation is fully distributed
(``spark.range`` → column expressions → ``explode``), so the same code
produces the 10^3-turn unit fixture and the 10^7-turn bench input without
ever materializing on the driver.

Shape knobs follow FIXTURES.md §1: turns-per-conversation is a truncated
power law (heavy tail ⇒ hub cascade openers, exercising the skew path,
SURVEY.md R1); participants-per-conversation ∈ [2, 8]; ``ts`` strictly
increasing with ``turn_idx`` within a conversation (an ``equal_ts``
variant repeats timestamps on consecutive turns to exercise the strict
``<`` activation rule, reference ``reconstruct.rs:83``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: 2020-01-01T00:00:00Z in epoch seconds — fixed time origin.
_EPOCH0 = 1_577_836_800


def _u01(*cols) -> "F.Column":
    """Deterministic uniform [0,1) from a hash of the given columns."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1 << 40))) / F.lit(float(1 << 40))


def synthetic_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    seed: int = 42,
    alpha: float = 1.5,
    max_turns: int = 256,
    min_turns: int = 2,
    max_participants: int = 8,
    equal_ts: bool = False,
) -> DataFrame:
    """Generate the transcripts table (schema = FIXTURES.md §1).

    Turns-per-conv ~ floor(min_turns * u^(-1/alpha)) truncated to
    [min_turns, max_turns] (Pareto tail). Every turn's participant, text
    and timestamp derive from ``xxhash64`` of (seed, conv, turn).
    """
    s = F.lit(seed)
    convs = (
        spark.range(n_convs)
        .select(
            F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
            F.col("id").alias("_cid"),
        )
        .withColumn(
            "_n_turns",
            F.least(
                F.lit(max_turns),
                F.greatest(
                    F.lit(min_turns),
                    F.floor(
                        F.lit(float(min_turns))
                        * F.pow(
                            _u01(s, F.col("_cid"), F.lit("nturns")) + F.lit(1e-12),
                            F.lit(-1.0 / alpha),
                        )
                    ).cast("int"),
                ),
            ),
        )
        .withColumn(
            "_n_parts",
            (
                F.lit(2)
                + F.pmod(
                    F.xxhash64(s, F.col("_cid"), F.lit("nparts")),
                    F.lit(max_participants - 1),
                )
            ).cast("int"),
        )
        .withColumn(
            "_step_s",
            (1 + F.pmod(F.xxhash64(s, F.col("_cid"), F.lit("step")), F.lit(60))).cast(
                "long"
            ),
        )
    )

    turns = convs.select(
        "conv_id",
        "_cid",
        "_n_parts",
        "_step_s",
        F.explode(F.sequence(F.lit(0), F.col("_n_turns") - 1)).alias("turn_idx"),
    )

    # Participant k ∈ [0, n_parts); turn 0's participant is the originator
    # by construction (whoever it is). role/tool split: every ~5th turn is
    # a tool turn whose effective participant comes from `tool`
    # (input_hint: coalesce(nullif(tool,''), role)).
    pk = F.pmod(F.xxhash64(s, F.col("_cid"), F.col("turn_idx"), F.lit("who")), F.col("_n_parts"))
    is_tool = (
        F.pmod(F.xxhash64(s, F.col("_cid"), F.col("turn_idx"), F.lit("tool?")), F.lit(5))
        == 0
    ) & (F.col("turn_idx") > 0)
    pname = F.format_string("agent_%d", pk)

    ts_expr = (
        F.lit(_EPOCH0)
        + F.col("_cid") % 86_400
        + (
            (F.col("turn_idx") - F.pmod(F.col("turn_idx"), 2)) if equal_ts else F.col("turn_idx")
        )
        * F.col("_step_s")
    )

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(is_tool, F.lit("assistant")).otherwise(pname).alias("role"),
        F.format_string(
            "t%d of %s: %x",
            F.col("turn_idx"),
            F.col("conv_id"),
            F.abs(F.xxhash64(s, F.col("_cid"), F.col("turn_idx"), F.lit("text"))),
        ).alias("text"),
        F.when(is_tool, pname).otherwise(F.lit(None).cast("string")).alias("tool"),
        F.timestamp_seconds(ts_expr).alias("ts"),
    )


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """Adapt the driver's ``events`` table
    (``event_id, ts, user_id, event_type, value, props``) into the
    transcripts shape (FIXTURES.md §6): conversation = user, turn order =
    (ts, event_id), participant = event_type. Used by the DuckDB-checked
    driver queries so the derivation pipeline runs against
    driver-generated data."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.format_string("u%d", F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        "ts",
    )
