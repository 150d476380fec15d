"""Event-transition analytics (first-order Markov counts) and corpus
mixture manifests — two small pipeline-planning operators.

``transition_counts`` is the clickstream workhorse: per user, order
events by ``(ts, event_id)`` (the engine-wide deterministic turn
order, ``twitter/get.rs:56-76``'s timestamp discipline) and count
every consecutive ``(from_type, to_type)`` pair; the empirical
transition probability is the integer-ratio ``n / Σ n over from_type``
through ``decimal_round`` — the module family's exactness contract.
Plan: ONE partitioned lag window (shuffles on ``user_id`` only) + one
map-side-combinable groupBy + a broadcast join of the per-source
totals (|event types| rows).

``mixture_manifest`` is the static data-mixing computation an LLM
pipeline runs before sampling (the DoReMi-lite / equal-token
baseline): per source, token totals and the sampling rate
``min_source_tokens / source_tokens`` that equalizes token mass across
sources.  Plan: one scan-shaped token count, one tiny groupBy, one
1-row broadcast cross-join for the min (the Q11 scalar idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round
from crgp_spark.operators.textstats import tokens


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(from_type, to_type, n, p): consecutive-event transition counts
    per user and the 4dp empirical probability out of ``from_type``."""
    w = Window.partitionBy(user_col).orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            decimal_round(
                F.col("n").cast("double") / F.col("_tot").cast("double"), 4
            ).alias("p"),
        )
    )


def mixture_manifest(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, n_tokens, sample_rate): per-source corpus mass
    and the rate that equalizes token mass to the smallest source
    (rate 1.0 for the smallest; 6dp integer-ratio rounding)."""
    per_src = (
        docs.select(source_col, F.size(tokens(F.col(text_col))).alias("_t"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_t").cast("long").alias("n_tokens"),
        )
    )
    mn = per_src.agg(F.min("n_tokens").alias("_mn"))
    return per_src.join(F.broadcast(mn)).select(
        source_col,
        "n_docs",
        "n_tokens",
        decimal_round(
            F.col("_mn").cast("double") / F.col("n_tokens").cast("double"), 6
        ).alias("sample_rate"),
    )


def succession_graph(
    events: DataFrame,
    min_weight: int = 3,
    channel_col: str = "event_type",
    actor_col: str = "user_id",
) -> DataFrame:
    """Directed actor-succession graph: edge ``src -> dst`` when actor
    ``dst`` acted immediately after ``src`` within the same channel
    (``channel_col`` stream ordered by the engine-wide deterministic
    ``(ts, event_id)`` order), kept when the pair recurred at least
    ``min_weight`` times. The natural cyclic directed graph of an event
    log — the input shape for ``operators/scc.py`` (influence edges are
    acyclic by construction, reference ``reconstruct.rs:37-134``; "who
    follows whom on a channel" is not).

    Plan: one window shuffled on the channel (bounded cardinality —
    channels, not users, so no single-partition collapse on real logs)
    + one map-side-combinable pair count. Returns ``(src, dst, weight)``.
    """
    w = Window.partitionBy(channel_col).orderBy("ts", "event_id")
    return (
        events.select(
            F.col(actor_col).alias("src"),
            F.lead(actor_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )
