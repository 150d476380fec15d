"""Incremental view maintenance: keep a grouped rollup in sync with a
CDC changelog WITHOUT rescanning the fact table.

The textbook delta-propagation technique (Gupta & Mumick's
counting-algorithm family) specialized to the self-maintainable
aggregates ``COUNT``/``SUM``: every winning change becomes retraction
and/or insertion rows, the deltas aggregate to one row per touched
group, and the maintained view absorbs them with an outer merge.
Groups whose count reaches zero disappear — exactly what a full
recompute over the applied snapshot produces (`diff.apply_changes`),
which is the tested contract.

Cost model at 100 TB: the changelog frontier is |changed keys| rows;
the only contact with the base table is fetching the OLD payload of
touched keys (one key semi-join — bloom/zone-map prunable, and the
standard price of retraction without a key-value store); the merge
touches |touched groups| + |view| rows, never the facts.  A nightly
full `GROUP BY` over the facts rescans everything; this path is
O(changes), which is why materialized-view engines ship it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crgp_spark.operators.diff import change_frontier


def rollup_view(
    df: DataFrame, group_cols: Sequence[str], val_col: str
) -> DataFrame:
    """The maintained view shape: ``(group_cols..., n, total)`` —
    count + sum per group, both self-maintainable under deltas."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"), F.sum(val_col).alias("total")
    )


def maintain_rollup(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    group_cols: Sequence[str],
    val_col: str,
    op_col: str = "op",
    base_agg: DataFrame | None = None,
) -> DataFrame:
    """Maintain ``rollup_view(base, group_cols, val_col)`` under a CDC
    changelog (same semantics as `diff.apply_changes`: latest change
    per key wins, ``'U'`` upserts the payload, ``'D'`` deletes).
    Returns the new view — equal to recomputing the rollup over the
    applied snapshot, including groups a migrating key leaves empty.

    ``base_agg`` is the CURRENT materialized view; pass it to skip the
    one base `GROUP BY` (a real deployment always does — recomputing
    it would defeat the point).  ``val_col`` must be non-NULL: a NULL
    cannot be retracted from a SUM.
    """
    keys = list(key_cols)
    groups = list(group_cols)
    frontier = change_frontier(changes, key_cols, order_cols)
    if base_agg is None:
        base_agg = rollup_view(base, groups, val_col)

    one = F.lit(1).cast("long")
    # retract the old payload of every touched key (U rewrites it,
    # D removes it); insert the winning upsert payloads
    retractions = base.join(frontier.select(*keys), keys, "left_semi").select(
        *groups, (-one).alias("_dn"), (-F.col(val_col)).alias("_dv")
    )
    insertions = frontier.filter(F.col(op_col) == "U").select(
        *groups, one.alias("_dn"), F.col(val_col).alias("_dv")
    )
    delta = (
        retractions.unionByName(insertions)
        .groupBy(*groups)
        .agg(F.sum("_dn").alias("_dn"), F.sum("_dv").alias("_dv"))
    )

    merged = base_agg.join(delta, groups, "full_outer")
    zero = F.lit(0).cast("long")
    n = F.coalesce(F.col("n"), zero) + F.coalesce(F.col("_dn"), zero)
    total = F.coalesce(F.col("total"), zero) + F.coalesce(F.col("_dv"), zero)
    return (
        merged.select(*groups, n.alias("n"), total.alias("total"))
        .where(F.col("n") > 0)
    )
