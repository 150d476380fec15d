"""Windowed streaming aggregation over the events stream.

The standard Structured Streaming shape the reference's epoch loop
cannot express (its state is cascade-keyed, not time-keyed): tumbling
event-time windows over a file stream, aggregated with map-side
partial sums inside each micro-batch and merged in the streaming state
store.

Exactness: the per-window value total is accumulated in integer cents
(``floor(value·100 + 0.5)``), so the streamed result equals the batch
GROUP BY bit-for-bit regardless of micro-batch boundaries or float
summation order — the same stream==batch contract the incremental
deriver is gated on.

``complete`` output mode is used so every window is emitted when the
bounded (``availableNow``) input drains; an unbounded deployment would
switch to ``append`` + ``withWatermark`` (late rows beyond the
watermark dropped) — the aggregation plan is identical, only the emit
policy changes.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.functions import ts_micros


def stream_window_counts(
    spark: SparkSession,
    in_dir: str,
    window: str = "1 hour",
    max_files_per_trigger: int | None = 4,
) -> DataFrame:
    """Run the tumbling-window aggregation over a parquet file stream
    (``availableNow`` — drains the directory in capped micro-batches,
    then stops) and return the final result as a DataFrame:
    ``(window_start long epoch-seconds, event_type, n_events,
    total_cents)``."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    agg = (
        stream.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("total_cents"),
        )
        .select(
            # window.start is TIMESTAMP_NTZ (Spark 4 parquet inference);
            # ts_micros is the engine's one NTZ-safe epoch conversion.
            (ts_micros(F.col("window.start")) / F.lit(1_000_000))
            .cast("long")
            .alias("window_start"),
            "event_type",
            "n_events",
            "total_cents",
        )
    )
    name = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_exact_dedup(
    spark: SparkSession,
    in_dir: str,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streamed exact-duplicate grouping: drain a document parquet
    stream and maintain per-content-digest state in the streaming
    aggregation store; emit ``(keep_id, n_dupes)`` — the min doc_id and
    multiplicity per distinct text. MIN and COUNT are commutative
    monoids, so the result is independent of epoch boundaries and
    arrival order: stream == batch ``exact_dedup`` exactly."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    agg = (
        stream.select("doc_id", F.md5(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
        .select("keep_id", "n_dupes")
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_sessions(
    spark: SparkSession,
    in_dir: str,
    gap_minutes: int = 30,
    max_files_per_trigger: int | None = 4,
) -> DataFrame:
    """Streamed gap-based sessionization with the NATIVE
    ``session_window`` state-store operator: per-user session windows
    merge across micro-batches as events drain (``availableNow``).

    Semantics note (and the oracle's contract): ``session_window``
    merges two events iff the later one starts AT OR inside
    ``prev_ts + gap``, i.e. a gap of exactly ``gap_minutes`` still
    MERGES (verified by test) — the same ``> gap`` new-session test as
    the batch ``sessionize`` operator, so the two agree on boundary
    gaps.  Emitted columns are all integer-derived (epoch micros,
    counts, value cents), so stream == batch bit-for-bit regardless of
    epoch boundaries.

    Returns ``(user_id, session_start_us, session_end_us, n_events,
    total_cents)`` where ``session_end_us`` is the window end (last
    event + gap), matching the operator's definition.
    """
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    agg = (
        stream.groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("total_cents"),
        )
        .select(
            "user_id",
            ts_micros(F.col("session_window.start")).alias("session_start_us"),
            ts_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
            "total_cents",
        )
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_interval_join(
    spark: SparkSession,
    in_dir: str,
    left_type: str = "view",
    right_type: str = "click",
    within_hours: int = 24,
    max_files_per_trigger: int | None = 4,
) -> DataFrame:
    """Watermarked STREAM-STREAM interval self-join — the attribution
    shape ("join every click to the same user's views in the preceding
    ``within_hours``") on Spark's native symmetric-hash-join state
    store, the last major Structured Streaming operator family the
    engine exercises (after windowed aggs, streaming dedup,
    session_window and the foreachBatch/applyInPandasWithState
    derivations).

    Stream == batch exactly for an INNER time-bounded join over a
    bounded (``availableNow``) drain: every matching pair is emitted
    once regardless of epoch boundaries; the deliberately generous
    watermark (the input's full span) means no row is ever dropped as
    late — correctness is independent of file arrival order, which the
    oracle twin (a plain batch interval join) certifies.  An unbounded
    deployment would tighten the watermark to its real disorder bound
    to cap state — the documented trade.

    Returns ``(user_id, left_id, right_id, lag_s)`` with lag in whole
    seconds (integer micros division — cross-engine exact).
    """
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # watermarks require TIMESTAMP (not the parquet NTZ type); the
    # session timezone is pinned UTC so the cast is deterministic
    stream = reader.parquet(in_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    wm = f"{within_hours * 100} hours"  # >> input span: nothing is late
    left = (
        stream.filter(F.col("event_type") == left_type)
        .withWatermark("ts", wm)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("l_ts"),
        )
    )
    right = (
        stream.filter(F.col("event_type") == right_type)
        .withWatermark("ts", wm)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    joined = left.join(
        right,
        F.expr(
            f"l_user = r_user AND r_ts >= l_ts "
            f"AND r_ts <= l_ts + INTERVAL {within_hours} HOURS"
        ),
    ).select(
        F.col("l_user").alias("user_id"),
        "left_id",
        "right_id",
        F.floor(
            (ts_micros(F.col("r_ts")) - ts_micros(F.col("l_ts")))
            / F.lit(1_000_000)
        ).alias("lag_s"),
    )
    name = f"ivjoin_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_heavy_hitters(
    spark: SparkSession,
    in_dir: str,
    key_col: str = "user_id",
    k: int = 20,
    depth: int = 4,
    width: int = 64,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming count-min heavy hitters — the sketch-over-a-stream
    shape count-min was invented for (Cormode & Muthukrishnan 2005):
    the d×w counter grid is maintained in the streaming aggregation
    state store (``groupBy(row, bucket).count`` — a pure commutative
    monoid, so the drained grid is bit-identical to the batch
    ``cms_sketch`` regardless of micro-batch slicing), then the
    drained grid scores the exact top-k — the module's stream==batch
    contract, certified by the SAME oracle as the batch
    ``heavy_hitters`` entry.

    At 100 TB the streaming state is d·w counters — constant — while
    an exact streaming per-key count would hold one state row per
    distinct key; that asymmetry is why production pipelines sketch
    the stream and only keep exact counts for the survivors.

    Returns ``(key_col, exact, est, over_ok)``.
    """
    from crgp_spark.operators.cms import _buckets, heavy_hitters

    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    grid = (
        stream.select(
            F.posexplode(_buckets(F.col(key_col), depth, width)).alias(
                "row", "bucket"
            )
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    name = f"cms_{uuid.uuid4().hex[:8]}"
    q = (
        grid.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return heavy_hitters(
        spark.read.parquet(in_dir),
        key_col,
        k=k,
        depth=depth,
        width=width,
        sketch=spark.table(name),
    )


def stream_dim_join(
    spark: SparkSession,
    in_dir: str,
    dim: DataFrame,
    key_expr: str,
    dim_key: str,
    attr_col: str,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Stream-static dimension join (VERDICT r3 #8) — the most common
    production streaming shape: the fact stream enriched against a
    broadcast dimension snapshot, then aggregated per dimension
    attribute. Returns ``(attr_col, n_events, total_cents)``.

    The static side is joined with an explicit ``F.broadcast`` (a
    dimension snapshot is by definition executor-resident; no shuffle
    of the unbounded side), and COUNT/SUM-of-cents are commutative
    monoids, so the drained result equals the batch join bit-for-bit
    across ANY micro-batch slicing — the module's stream==batch
    contract. Unbounded deployments get dimension updates by restarting
    the query against the new snapshot (the static side is pinned at
    query start — Structured Streaming semantics worth gating, not
    hiding)."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    joined = stream.withColumn("_k", F.expr(key_expr)).join(
        F.broadcast(dim), F.col("_k") == F.col(dim_key)
    )
    agg = joined.groupBy(attr_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("total_cents"),
    )
    name = f"dimjoin_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_hll_distinct(
    spark: SparkSession,
    in_dir: str,
    group_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 6,
    cap: int = 40,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming HyperLogLog distinct counting — the register table
    maintained in the streaming aggregation state store. Per-register
    MAX is a commutative idempotent monoid, so the drained registers —
    and therefore the integer summary AND the α-estimate — are
    bit-identical to the batch ``hll_distinct`` regardless of
    micro-batch slicing: the module's stream==batch contract,
    certified by the SAME oracle as the batch ``hll`` entry.

    At 100 TB the streaming state is ≤ m = 2^p rows per group —
    constant — where exact streaming COUNT(DISTINCT) would hold one
    state row per distinct value; the same state asymmetry as
    `stream_heavy_hitters`, for cardinality instead of frequency.

    Returns ``(group_col, m, v_zero, s_scaled, raw_est)``.
    """
    from crgp_spark.operators.hll import hll_sketch, hll_summary

    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    name = f"hll_{uuid.uuid4().hex[:8]}"
    q = (
        hll_sketch(stream, group_col, value_col, p=p, cap=cap)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return hll_summary(spark.table(name), group_col, p=p, cap=cap)


def stream_hist_quantiles(
    spark: SparkSession,
    in_dir: str,
    group_col: str,
    value_col: str,
    boundaries: list[float],
    qs: list[float],
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming mergeable histogram-quantile sketch — the bucket-count
    table of ``operators/histogram.py::hist_sketch`` maintained in the
    streaming aggregation state store.  Per-bucket COUNT is a SUM
    monoid (the most map-side-combinable state there is), so the
    drained sketch — and therefore every quantile read off it — is
    bit-identical to the batch ``hist_grouped_quantiles`` regardless
    of micro-batch slicing: the module's stream==batch contract,
    certified by the SAME oracle as the batch ``hist_quantiles``
    entry.

    At 100 TB the streaming state is ≤ |groups|·(len(boundaries)+1)
    rows — constant in the stream length — where an exact streaming
    percentile would have to buffer every value.  Same state asymmetry
    as ``stream_hll_distinct``, for quantiles instead of cardinality.
    """
    from crgp_spark.operators.histogram import hist_quantiles, hist_sketch

    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    name = f"histq_{uuid.uuid4().hex[:8]}"
    q = (
        hist_sketch(stream, group_col, value_col, boundaries)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return hist_quantiles(spark.table(name), boundaries, qs)


def stream_roc_auc(
    spark: SparkSession,
    in_dir: str,
    score_col: str,
    label_expr: str,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming exact ROC-AUC — the per-SCORE-GROUP (cnt, pos)
    counts of ``operators/evalmetrics.py::roc_auc`` maintained in the
    streaming aggregation state store.  Both counts are SUM monoids,
    so the drained score-group table — and therefore the midrank
    Mann-Whitney statistic computed from it — is bit-identical to the
    batch AUC regardless of micro-batch slicing: the module's
    stream==batch contract, certified by the SAME oracle as the batch
    ``auc`` entry.

    At 100 TB the streaming state is ≤ |score domain| rows — for a
    quantized model score, thousands — where an exact streaming rank
    statistic computed naively would buffer every row.  Same state
    asymmetry as ``stream_hist_quantiles``, for a rank statistic
    instead of quantiles.
    """
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    grouped = (
        stream.select(
            F.col(score_col).alias("_s"),
            F.expr(label_expr).cast("long").alias("_y"),
        )
        .where(F.col("_s").isNotNull())
        .groupBy("_s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("_y").cast("long").alias("pos"),
        )
    )
    name = f"auc_{uuid.uuid4().hex[:8]}"
    q = (
        grouped.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from crgp_spark.operators.evalmetrics import auc_from_groups

    return auc_from_groups(spark.table(name))


def stream_calibration(
    spark: SparkSession,
    in_dir: str,
    score_col: str,
    label_expr: str,
    bucket_width: int,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming reliability diagram — the per-bucket ``(n, n_pos)``
    counts of ``operators/evalmetrics.py::calibration_curve``
    maintained in the streaming aggregation state store (both SUM
    monoids; state = bucket count, constant in stream length).  The
    drained table folds to the exact batch curve at any micro-batch
    slicing, certified by the SAME oracle as the batch
    ``calibration`` entry."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    grouped = (
        stream.select(
            F.col(score_col).cast("long").alias("_s"),
            F.expr(label_expr).cast("long").alias("_y"),
        )
        .where(F.col("_s").isNotNull())
        .select(F.expr(f"_s div {int(bucket_width)}").alias("bucket"), "_y")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_y").cast("long").alias("n_pos"),
        )
    )
    name = f"calib_{uuid.uuid4().hex[:8]}"
    q = (
        grouped.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = spark.table(name)
    return t.select(
        "bucket",
        "n",
        "n_pos",
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
            "pos_rate"
        ),
    )


def stream_ks_test(
    spark: SparkSession,
    in_dir: str,
    user_col: str = "user_id",
    value_col: str = "value",
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming exact two-sample KS — the per-user cent totals of
    ``operators/experiment.py::ks_test`` maintained in the streaming
    aggregation state store (a per-key SUM monoid), then folded to the
    statistic by the shared ``ks_from_user_totals`` tail. The drained
    per-user table is independent of micro-batch slicing, so the
    statistic is bit-identical to the batch entry at any trigger
    cadence: the module's stream==batch contract, certified by the
    SAME oracle as the batch ``ks_test`` entry.

    State is |users| rows of one BIGINT each — the canonical running-
    per-key-sum shape (same asymmetry argument as sessionization: an
    exact streaming rank statistic computed naively would buffer every
    event; the monoid keeps state linear in keys, not events)."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    grouped = (
        stream.select(
            F.col(user_col).alias("u"),
            F.floor(F.col(value_col) * 100 + F.lit(0.5))
            .cast("long")
            .alias("c"),
        )
        .groupBy("u")
        .agg(F.sum("c").alias("y"))
    )
    name = f"ks_{uuid.uuid4().hex[:8]}"
    q = (
        grouped.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from crgp_spark.operators.experiment import ks_from_user_totals

    return ks_from_user_totals(spark.table(name))


def stream_chi2_test(
    spark: SparkSession,
    in_dir: str,
    cat_col: str = "event_type",
    user_col: str = "user_id",
    n_arms: int = 2,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming chi-square independence test — the ``(cat, arm)``
    contingency cell counts of ``operators/experiment.py::
    chi2_independence`` maintained in the streaming aggregation state
    store (a per-key SUM monoid, R×C rows of state — constant in
    stream length), then folded to the statistic by the shared
    ``chi2_from_cells`` tail. Drained cells are independent of
    micro-batch slicing, so the statistic is bit-identical to batch at
    any trigger cadence: the module's stream==batch contract,
    certified by the SAME oracle as the batch ``chi2`` entry."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    grouped = stream.groupBy(
        F.col(cat_col).alias("cat"),
        F.pmod(F.col(user_col), F.lit(n_arms)).cast("int").alias("arm"),
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    name = f"chi2_{uuid.uuid4().hex[:8]}"
    q = (
        grouped.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from crgp_spark.operators.experiment import chi2_from_cells

    # chi2_from_cells self-joins its input (marginals x cells); the
    # memory-sink view trips Spark's conflicting-reference resolution
    # under that shape, so rehydrate the R x C cell table with fresh
    # lineage — it is vocabulary-sized state (the k-means O(k·dim)
    # driver-state posture), never data-sized
    drained = spark.table(name)
    cells = spark.createDataFrame(drained.collect(), drained.schema)
    return chi2_from_cells(cells)


def stream_benford(
    spark: SparkSession,
    in_dir: str,
    value_col: str = "value",
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming Benford first-digit audit — the nine digit counts of
    ``operators/gini.py::benford_audit`` maintained in the streaming
    aggregation state store (a 9-row SUM monoid, constant state), then
    folded to the deviation statistic by the shared batch tail. The
    drained counts are independent of micro-batch slicing, so the
    audit is bit-identical to batch at any trigger cadence: the
    module's stream==batch contract, certified by the SAME oracle as
    the batch ``benford`` entry."""
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    digits = (
        stream.select(
            F.floor(F.col(value_col) * 100 + F.lit(0.5))
            .cast("long")
            .alias("_x")
        )
        .filter(F.col("_x") > 0)
        .select(
            F.substring(F.col("_x").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    name = f"benford_{uuid.uuid4().hex[:8]}"
    q = (
        digits.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from crgp_spark.operators.gini import benford_from_counts

    drained = spark.table(name)
    cells = spark.createDataFrame(drained.collect(), drained.schema)
    return benford_from_counts(cells)
