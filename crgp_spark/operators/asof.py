"""As-of join: attach to each left row the most recent right row per
key at or before the left row's timestamp.

Spark has no ASOF JOIN operator (DuckDB/kdb do); the naive encoding —
``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + per-row max — explodes
to O(|L|·|R|/keys) intermediate rows.  The scalable encoding used here
is the UNION + WINDOW idiom: tag both sides, interleave them in one
(key, ts)-ordered stream, and carry the right side's payload forward
with ``last(..., ignoreNulls=True)`` over ``rowsBetween(unbounded, 0)``
— one shuffle on the key, linear work, no join blow-up, and the window
is per-key (never global).  Ties (equal ts) resolve right-before-left
via the side tag in the sort key, i.e. a right row AT the left row's
timestamp is visible — the standard backward as-of semantic.

At 100 TB this is the plan you want: a single hash exchange on the key
(both inputs co-partitioned), in-partition sort, streaming window —
skew follows the key distribution exactly like any groupBy, so the
usual salting applies to pathological keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join. ``left`` keeps all its columns; for each of
    ``right_cols`` a ``<col><suffix>`` column carries the value from
    the latest ``right`` row with the same ``on`` key and ``right.ts <=
    left.ts`` (null when no such row).  Within equal timestamps the
    right side wins (is visible); multiple right rows at the same
    (key, ts) resolve to the last under a deterministic tie-break on
    the payload columns."""
    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (on, ts)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    ).select(*lcols, "_side", *[f"_r_{c}" for c in right_cols])
    # right rows sort BEFORE left rows at equal ts (_side 0 < 1); among
    # equal (key, ts, side) right rows the payload tie-break fixes the
    # carried value deterministically
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_side", *[f"_r_{c}" for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c + suffix)
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
