"""Streaming sequential-pattern state — the 11th gated stream==batch
path.

The batch ``operators/seqmatch.py`` census needs each key's events in
exact ``(ts, event_id)`` order; a stream delivers them sliced into
arbitrary micro-batches. The state kept per key in the streaming
aggregation store is therefore the ORDER-FREE multiset of
``(us, event_id, code)`` structs (``collect_list`` under shuffle —
multiset union is a commutative monoid, so the drained state is
independent of micro-batch slicing), and the total order is
reconstructed once at drain time by the same ``assemble_codes``
sort-and-join the batch path uses. That makes the streamed census
bit-identical to batch ``keyed_sequences`` + ``sequence_pattern_counts``
— certified in the driver gate by the SAME oracle SQL as the batch
``seqmatch`` entry.

State size is each key's full event multiset — the honest cost of
order-sensitive sequence analytics (the batch path shuffles the same
rows); an unbounded deployment bounds it with a watermark + session /
tumbling window on the key, which changes the census's scope, not this
plan shape.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.operators.seqmatch import assemble_codes, coded_events


def stream_sequence_counts(
    spark: SparkSession,
    in_dir: str,
    code_map: dict[str, str],
    pattern: str,
    key_col: str = "user_id",
    type_col: str = "event_type",
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Drain a parquet file stream (``availableNow``, capped
    micro-batches) through the per-key multiset state and return the
    batch-identical ``(key, seq_len, n_hits)`` census."""
    if not pattern:
        raise ValueError("pattern must be non-empty")
    schema = spark.read.parquet(in_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(in_dir)
    agg = (
        coded_events(stream, code_map, key_col, type_col)
        .groupBy("key")
        .agg(
            F.collect_list(F.struct("us", "event_id", "code")).alias("evs")
        )
    )
    name = f"seqmatch_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    seqs = spark.table(name).select(
        "key", assemble_codes(F.col("evs")).alias("seq")
    )
    return seqs.select(
        "key",
        F.length("seq").cast("long").alias("seq_len"),
        F.regexp_count("seq", F.lit(pattern)).cast("long").alias("n_hits"),
    )
