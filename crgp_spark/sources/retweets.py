"""Reference-shaped retweet source: JSON-lines of Twitter statuses
(SURVEY.md §2.1 O2; reference ``crgp-lib/src/twitter/get.rs:28-77``).

``spark.read.json`` with the explicit nested schema — the one nested
struct in the whole data model (``twitter/retweet.rs:22-34``) — then a
flattening projection. Lines that are not retweets (no
``retweeted_status``, e.g. the original tweets in the stream) and
malformed lines are discarded, mirroring the reference's
warn-and-discard parser (``get.rs:56-76``).

The reference requires the file to be sorted by ``created_at``
(an input contract asserted only in its tests, ``get.rs:142-147``);
our engine does NOT inherit that contract — ordering is explicit
everywhere downstream — so no sort is imposed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.schemas import RETWEET_JSON as RETWEET_JSON_SCHEMA  # noqa: E501  (serde-equivalent explicit schema)


def load_retweets(spark: SparkSession, path: str) -> DataFrame:
    """Load a JSON-lines status file as the flattened retweets table
    ``(rt_id, rt_user, rt_ts, cascade_id, orig_user, orig_ts)``
    (schemas.RETWEETS). Non-retweet and malformed lines are dropped."""
    raw = (
        spark.read.schema(RETWEET_JSON_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
    return (
        raw.filter(
            F.col("retweeted_status").isNotNull()
            & F.col("retweeted_status.id").isNotNull()
        )
        .select(
            F.col("id").alias("rt_id"),
            F.col("user.id").alias("rt_user"),
            F.col("created_at").alias("rt_ts"),
            F.col("retweeted_status.id").alias("cascade_id"),
            F.col("retweeted_status.user.id").alias("orig_user"),
            F.col("retweeted_status.created_at").alias("orig_ts"),
        )
    )
