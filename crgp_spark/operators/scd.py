"""Slowly-changing-dimension (SCD Type 2) history builder.

The warehouse-side primitive every link-graph pipeline eventually
needs: turn an append-only update log ``(key, ts, attrs...)`` into a
versioned dimension ``(key, attrs..., valid_from, valid_to,
is_current)`` where consecutive rows with unchanged tracked attributes
are collapsed and each surviving version's interval runs to the next
change (half-open, NULL ``valid_to`` = current).  This is the batch
equivalent of Delta/Iceberg ``MERGE``-maintained type-2 dims, expressed
as two window passes so Catalyst keeps it one shuffle.

Plan shape at 100 TB: ONE exchange on ``key`` serves both window
passes (same partitioning+ordering → a single sort), then everything
is narrow: lag-compare, filter, lead.  No joins, no UDFs; change
detection uses a null-safe struct comparison so NULL attribute values
version correctly.

Determinism: callers must pass ``order_cols`` that break ``ts`` ties
totally (e.g. an event id); otherwise same-timestamp updates make the
version chain order-dependent — the same contract as
`sessions.sessionize`.

No reference counterpart (the reference's graphs are immutable once
derived; file:line n/a) — this extends the relational family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    tracked_cols: Sequence[str],
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse an update log into SCD-2 versions.

    Returns ``(key_col, *tracked_cols, valid_from, valid_to,
    is_current)`` with ``valid_from``/``valid_to`` in integer
    microseconds (`functions.ts_micros` idiom; ``valid_to`` NULL for
    the open current version).
    """
    if not tracked_cols:
        raise ValueError("tracked_cols must name at least one column")
    from crgp_spark.functions import ts_micros

    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(key_col).orderBy(*order)
    # per-column eqNullSafe (NOT a struct compare: struct equality does
    # not treat inner NULL fields as equal, so NULL->NULL attribute
    # runs would fail to collapse)
    unchanged = F.lit(True)
    for c in tracked_cols:
        unchanged = unchanged & F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
    changes = (
        updates.withColumn(
            "_new", (F.row_number().over(w) == 1) | ~unchanged
        )
        .where(F.col("_new"))
        .drop("_new")
    )
    # same partitioning AND ordering as `w`: Catalyst reuses the one
    # exchange+sort for this second window pass
    w2 = Window.partitionBy(key_col).orderBy(*order)
    valid_to = F.lead(ts_micros(ts_col)).over(w2)
    return changes.select(
        key_col,
        *tracked_cols,
        ts_micros(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
