"""Rendezvous (highest-random-weight) shard assignment.

Consistent hashing for the data plane: each record goes to the shard
with the highest ``hash(record, shard)`` weight.  When the shard count
grows N → N+1, only ~1/(N+1) of records move (those whose new shard
now wins) — unlike ``pmod(hash, N)`` where nearly everything moves.
That stability is what makes incremental re-partitioning of a 100 TB
corpus affordable: a resize rewrites one new shard's worth of data,
not the whole lake.

Implementation is pure expression work: explode the shard list, weight
with the engine-wide `functions.md5_num60` idiom (deterministic in
both engines), keep the argmax via one map-side-combinable
``max_by`` — one groupBy on the record key, no windows.  For large N
prefer a fold over ``F.greatest`` of N weight expressions (no explode
blow-up); at typical shard counts (≤ 1024) the explode is fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _weight(key: F.Column, shard: F.Column) -> F.Column:
    from crgp_spark.functions import md5_num60

    return md5_num60(
        F.concat_ws("#", key.cast("string"), shard.cast("string"))
    )


def rendezvous_assign(
    df: DataFrame, id_col: str, n_shards: int
) -> DataFrame:
    """Append ``shard``: the rendezvous winner in ``[0, n_shards)``
    for each row's ``id_col``.  Deterministic; minimal movement under
    ``n_shards`` changes (tested)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.col(id_col)
    pairs = F.array(
        *[
            F.struct(
                _weight(key, F.lit(s)).alias("w"),
                F.lit(s).cast("int").alias("s"),
            )
            for s in range(n_shards)
        ]
    )
    # array_max on (w, s) structs: struct ordering picks the highest
    # weight (w collisions broken by shard id) — no explode, no shuffle
    return df.withColumn("shard", F.array_max(pairs)["s"])
