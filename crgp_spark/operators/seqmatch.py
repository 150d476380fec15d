"""Event-sequence pattern matching (MATCH_RECOGNIZE-lite).

Encodes each key's chronologically-ordered event stream as a compact
code string (one character per event) and counts non-overlapping
regex matches over it — the sequential-pattern idiom SQL exposes as
MATCH_RECOGNIZE and funnels special-case (``operators/funnel.py`` is
the ordered-prefix instance; this operator takes an arbitrary regular
language). On transcripts it answers "how many error-streaks end in a
successful click?", "does view→click→purchase happen with anything in
between?" — questions the reference's per-cascade counters
(``statistics.rs:17-131``) cannot pose.

Scale shape: ONE groupBy(key) shuffle builds the per-key sequence;
everything after is scan-speed string codegen. Per-key sequence length
is bounded by that key's activity — hub keys are the usual skew case,
so ``max_events_per_key`` gives a deterministic earliest-N truncation
(window row_number over the same total order) that caps both memory
and string length before the aggregation. Patterns must stay in the
RE2-expressible subset (no backreferences/lookaround) so Spark's Java
regex and any RE2-based engine count identically; greedy leftmost
non-overlapping semantics agree on that subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import ts_micros


def coded_events(
    events: DataFrame,
    code_map: dict[str, str],
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Map the event log to ``(key, code, us, event_id)`` rows — the
    shared pre-aggregation stage of the batch and streaming sequence
    paths. ``code_map`` maps event types to single characters; unmapped
    types are dropped (explicit vocabulary, never a silent '?')."""
    for t, c in code_map.items():
        if len(c) != 1:
            raise ValueError(f"code for {t!r} must be 1 char, got {c!r}")
    code = None
    for t, c in sorted(code_map.items()):
        branch = F.when(F.col(type_col) == t, F.lit(c))
        code = branch if code is None else code.when(
            F.col(type_col) == t, F.lit(c)
        )
    return events.select(
        F.col(key_col).alias("key"),
        code.alias("code"),
        ts_micros("ts").alias("us"),
        "event_id",
    ).filter(F.col("code").isNotNull())


def assemble_codes(evs):  # Column -> Column
    """``array<struct<us,event_id,code>>`` → the exact-total-order code
    string: sort_array over the struct order (us, event_id) then join —
    deterministic under ANY accumulation order, which is what makes the
    streamed multiset state drain to the batch string bit-for-bit."""
    return F.array_join(
        F.transform(F.array_sort(evs), lambda s: s["code"]), ""
    )


def keyed_sequences(
    events: DataFrame,
    code_map: dict[str, str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    max_events_per_key: int | None = None,
) -> DataFrame:
    """Per-key code string ``(key, seq)`` in exact ``(ts, event_id)``
    order."""
    ev = coded_events(events, code_map, key_col, type_col)
    if max_events_per_key is not None:
        w = Window.partitionBy("key").orderBy("us", "event_id")
        ev = ev.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= max_events_per_key
        )
    # sort_array over (us, event_id, code) structs = the exact total
    # order, assembled JVM-side; array_join leaves one string per key
    return ev.groupBy("key").agg(
        assemble_codes(
            F.collect_list(F.struct("us", "event_id", "code"))
        ).alias("seq")
    )


def sequence_pattern_counts(seqs: DataFrame, pattern: str) -> DataFrame:
    """Non-overlapping match census ``(key, seq_len, n_hits)`` of the
    regex ``pattern`` over each key's code string, exact BIGINTs."""
    if not pattern:
        raise ValueError("pattern must be non-empty")
    return seqs.select(
        "key",
        F.length("seq").cast("long").alias("seq_len"),
        F.regexp_count("seq", F.lit(pattern)).cast("long").alias("n_hits"),
    )
