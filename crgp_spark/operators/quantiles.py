"""Exact grouped quantiles over an event/metric stream.

The reference's statistics stage reduces each counter to a single
aggregate per worker (``statistics.rs:17-131``); a real analytics user
additionally wants distributional summaries.  This operator computes
EXACT percentiles (Spark's sort-based ``percentile`` aggregate, linear
interpolation — the same definition as DuckDB's ``quantile_cont``, so
the oracle comparison is bit-for-bit on doubles).

Scale note: exact percentile buffers the value multiset per group
(map-side combined into a count-map, merged on the reducer).  That is
the right tool while per-group cardinality fits an executor (here:
event types × distinct cents values).  For 100 TB-scale arbitrary
doubles the drop-in replacement is ``F.approx_percentile`` (t-digest,
bounded memory, mergeable) — same call shape, no longer hashable
against an exact oracle, which is why the gated query uses the exact
form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PCTS = [0.25, 0.50, 0.75, 0.90, 0.99]


def value_quantiles(
    events: DataFrame,
    key: str = "event_type",
    value: str = "value",
    pcts: list[float] = PCTS,
) -> DataFrame:
    """Per-``key`` exact percentiles of ``value``: one row per key with
    ``n`` and one ``p<XX>`` double column per requested percentile."""
    q: Column = F.percentile(value, F.array(*[F.lit(p) for p in pcts]))
    cols = [
        q[i].alias("p" + format(p * 100, "g").replace(".", "_"))
        for i, p in enumerate(pcts)
    ]
    return events.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"), *cols
    )
