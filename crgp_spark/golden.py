"""The reference's golden fixture, transliterated.

Reference fixture: 5-user social graph (``data/social_graph/``:
0→{1,2}, 1→{0,2,3}, 2→{0}, 3→{2}, 4→{2}), 6 retweets in 2 cascades
(``data/retweets.json``), producing exactly 7 influence edges
(``crgp-lib/tests/algorithm_execution.rs:58-66``, format
``cascade;retweet;influencee;influencer;ts;-1``).

Re-encoded here both as (a) the engine's transcripts input (cascade →
conversation, original tweet → turn 0, each retweet → the next turn,
participant ``u{id}``) and (b) the reference-shaped flattened retweets +
friendship tables — so both derivation paths are pinned to the same
golden output.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession

from crgp_spark.schemas import FRIENDSHIPS, RETWEETS, TRANSCRIPTS

#: user -> friends (accounts the user follows = candidate influencers).
GOLDEN_GRAPH: dict[int, list[int]] = {
    0: [1, 2],
    1: [0, 2, 3],
    2: [0],
    3: [2],
    4: [2],
}

#: (cascade_id, rt_id, rt_user, rt_ts, orig_user, orig_ts) — the six
#: retweet lines of data/retweets.json (original tweets excluded, as the
#: reference's parser drops lines without ``retweeted_status``,
#: twitter/get.rs:56-76).
GOLDEN_RETWEETS: list[tuple[int, int, int, int, int, int]] = [
    (1, 3, 2, 1, 0, 0),
    (1, 4, 1, 2, 0, 0),
    (2, 5, 0, 3, 1, 1),
    (1, 6, 3, 3, 0, 0),
    (2, 7, 2, 4, 1, 1),
    (2, 8, 3, 5, 1, 1),
]

#: The 7 golden edges as (cascade_id, retweet_id, influencee, influencer,
#: ts) — tests/algorithm_execution.rs:58-66.
GOLDEN_EDGES: set[tuple[int, int, int, int, int]] = {
    (1, 3, 2, 0, 1),
    (1, 4, 1, 0, 2),
    (1, 4, 1, 2, 2),
    (1, 6, 3, 2, 3),
    (2, 5, 0, 1, 3),
    (2, 7, 2, 0, 4),
    (2, 8, 3, 2, 5),
}

#: Same 7 edges in transcript natural-key form:
#: (conv_id, src_turn, dst_turn, ts_seconds). Turn indices follow from
#: ordering each cascade's events by timestamp (opener = turn 0).
#: conv_1 turns: 0:u0@0, 1:u2@1, 2:u1@2, 3:u3@3
#: conv_2 turns: 0:u1@1, 1:u0@3, 2:u2@4, 3:u3@5
GOLDEN_EDGE_TURNS: set[tuple[str, int, int, int]] = {
    ("conv_1", 0, 1, 1),
    ("conv_1", 0, 2, 2),
    ("conv_1", 1, 2, 2),
    ("conv_1", 1, 3, 3),
    ("conv_2", 0, 1, 3),
    ("conv_2", 1, 2, 4),
    ("conv_2", 2, 3, 5),
}


def _ts(epoch_seconds: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(epoch_seconds, _dt.timezone.utc).replace(
        tzinfo=None
    )


def golden_transcripts(spark: SparkSession) -> DataFrame:
    """The golden cascades as a transcripts table."""
    rows = []
    # Openers (the original tweets): cascade 1 by u0 @0, cascade 2 by u1 @1.
    openers = {1: (0, 0), 2: (1, 1)}
    per_conv: dict[int, list[tuple[int, int]]] = {1: [], 2: []}
    for cascade, _rt_id, user, ts, _ou, _ots in GOLDEN_RETWEETS:
        per_conv[cascade].append((user, ts))
    for cascade, (ou, ots) in openers.items():
        conv = f"conv_{cascade}"
        turns = [(ou, ots)] + sorted(per_conv[cascade], key=lambda x: x[1])
        for idx, (user, ts) in enumerate(turns):
            rows.append(
                (conv, idx, f"u{user}", f"t{idx} of {conv}", None, _ts(ts))
            )
    return spark.createDataFrame(rows, schema=TRANSCRIPTS)


def golden_friendships(spark: SparkSession, as_participants: bool = True):
    """The golden social graph; ``as_participants=True`` yields string
    participant names (``u0``…) for the transcripts path, else long ids
    for the reference-shaped path."""
    pairs = [(u, f) for u, fs in GOLDEN_GRAPH.items() for f in fs]
    if as_participants:
        return spark.createDataFrame(
            [(f"u{u}", f"u{f}") for u, f in pairs], "user string, friend string"
        )
    return spark.createDataFrame(pairs, schema=FRIENDSHIPS)


def golden_retweets(spark: SparkSession) -> DataFrame:
    rows = [
        (rt_id, rt_user, rt_ts, cascade, ou, ots)
        for cascade, rt_id, rt_user, rt_ts, ou, ots in GOLDEN_RETWEETS
    ]
    return spark.createDataFrame(rows, schema=RETWEETS)
