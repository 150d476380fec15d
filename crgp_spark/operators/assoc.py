"""Pairwise association rules (market-basket lite) over event baskets.

"Users who do A also do B": for every unordered pair of items that
co-occur in at least ``min_pairs`` baskets, the support / confidence /
lift triple — the first-line co-occurrence readout before reaching for
a full FP-growth (which Spark ships in MLlib; this operator is the
exact DataFrame-native core that covers the dominant pairwise case).

All counts are BIGINT from two grouped aggregates and one basket-local
self-join; the float ratios are computed once per surviving pair in
pinned expression order (6dp). The basket self-join fans out per
basket as |basket|² — baskets here are DISTINCT item sets per user, so
the fan-out is bounded by the item-vocabulary size squared, not by
event volume; a hub user contributes the same bounded pair set as
anyone else. That bound is what makes the plan safe at 100 TB: the
shuffle keys are (user) then (item pair), both with map-side combine.

Reference scope ends at cascade statistics (``statistics.rs:17-131``);
co-occurrence mining is the standard next question on its event data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round

__all__ = ["association_rules"]


def association_rules(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "event_type",
    min_pairs: int = 1,
) -> DataFrame:
    """``(a, b, n_ab, n_a, n_b, support, conf_ab, conf_ba, lift)`` per
    unordered item pair (``a < b``) co-occurring in ≥ ``min_pairs``
    user baskets; ``support = n_ab/n_users``, ``conf_ab =
    P(b | a) = n_ab/n_a``, ``lift = n·n_ab/(n_a·n_b)``."""
    baskets = events.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("item")
    ).distinct()
    n_users = baskets.select("u").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    item_cnt = baskets.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    l = baskets.select("u", F.col("item").alias("a"))
    r = baskets.select("u", F.col("item").alias("b"))
    pairs = (
        l.join(r, "u")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    j = (
        pairs.join(
            F.broadcast(
                item_cnt.withColumnsRenamed(
                    {"item": "a", "n_item": "n_a"}
                )
            ),
            "a",
        )
        .join(
            F.broadcast(
                item_cnt.withColumnsRenamed(
                    {"item": "b", "n_item": "n_b"}
                )
            ),
            "b",
        )
        .join(F.broadcast(n_users))
    )
    fd = lambda c: F.col(c).cast("double")  # noqa: E731
    return j.select(
        "a",
        "b",
        "n_ab",
        "n_a",
        "n_b",
        decimal_round(fd("n_ab") / fd("n"), 6).alias("support"),
        decimal_round(fd("n_ab") / fd("n_a"), 6).alias("conf_ab"),
        decimal_round(fd("n_ab") / fd("n_b"), 6).alias("conf_ba"),
        decimal_round(
            fd("n") * fd("n_ab") / (fd("n_a") * fd("n_b")), 6
        ).alias("lift"),
    ).orderBy("a", "b")
