"""Fixed schemas, declared once (mirrors the reference's fixed compile-time
struct schemas, ``crgp-lib/src/twitter/*.rs`` / ``social_graph/*.rs``)."""

from __future__ import annotations

from pyspark.sql import types as T

#: Primary engine input (BASELINE.json input_hint).
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

#: Derived influence-edge table ≈ the reference's ``InfluenceEdge``
#: (``crgp-lib/src/social_graph/influence_edge.rs:20-43``):
#: src=influencer vertex, dst=influenced turn vertex, ts=influence time,
#: orig=cascade-originator vertex; ``salt`` is the skew-neutral partition
#: refinement added per the north rule.
EDGES = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("orig", T.LongType(), False),
        T.StructField("salt", T.IntegerType(), True),
    ]
)

#: Exploded social-graph adjacency (reference ``SocialGraph``,
#: ``social_graph/graph.rs:17-22``): ``user`` follows ``friend``; the
#: friend is the candidate influencer of the user. ``friend < 0`` denotes
#: dummy-pad users (``twitter/mod.rs:18-21``).
FRIENDSHIPS = T.StructType(
    [
        T.StructField("user", T.LongType(), False),
        T.StructField("friend", T.LongType(), False),
    ]
)

#: Flattened ``Retweet`` (``crgp-lib/src/twitter/retweet.rs:22-34``) —
#: reference-shaped cascade input for the direct (non-transcript) path.
RETWEETS = T.StructType(
    [
        T.StructField("rt_id", T.LongType(), False),
        T.StructField("rt_user", T.LongType(), False),
        T.StructField("rt_ts", T.LongType(), False),
        T.StructField("cascade_id", T.LongType(), False),
        T.StructField("orig_user", T.LongType(), False),
        T.StructField("orig_ts", T.LongType(), False),
    ]
)

#: Raw retweet JSON-lines schema (explicit, no inference — the reference
#: parses these fields with serde and ignores everything else,
#: ``twitter/get.rs:56-76``).
RETWEET_JSON = T.StructType(
    [
        T.StructField("created_at", T.LongType(), True),
        T.StructField("id", T.LongType(), True),
        T.StructField(
            "user",
            T.StructType([T.StructField("id", T.LongType(), True)]),
            True,
        ),
        T.StructField(
            "retweeted_status",
            T.StructType(
                [
                    T.StructField("created_at", T.LongType(), True),
                    T.StructField("id", T.LongType(), True),
                    T.StructField(
                        "user",
                        T.StructType([T.StructField("id", T.LongType(), True)]),
                        True,
                    ),
                ]
            ),
            True,
        ),
    ]
)

#: Per-superstep, per-partition lineage row (north-rule requirement).
LINEAGE = T.StructType(
    [
        T.StructField("algo", T.StringType(), False),
        T.StructField("iteration", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("edges_scanned", T.LongType(), False),
        T.StructField("messages_sent", T.LongType(), False),
        T.StructField("frontier_size", T.LongType(), False),
        T.StructField("skew_ratio", T.DoubleType(), False),
    ]
)
