"""k-anonymity: quasi-identifier risk measurement and ladder
generalization (Sweeney 2002; the Mondrian/Incognito family's
full-domain special case).

`curation.redact_pii` strips direct identifiers; what it cannot catch
is re-identification through QUASI-identifiers — combinations like
(segment, nation, balance bucket) that isolate individuals.  A release
is k-anonymous when every quasi-identifier combination is shared by at
least k rows.

- ``k_anonymity_risk``: ONE combinable groupBy over the
  quasi-columns; flags equivalence classes below k.  Group count is
  bounded by the quasi-domain, not the row count — metadata-sized
  output at any scale.
- ``generalize_until_k``: walk a generalization LADDER (caller-declared
  projections, finest first — e.g. exact nation → nation//5 → dropped)
  and return the FIRST level whose classes all reach k.  Each level is
  one groupBy + one O(1) violation count; the loop is over ladder
  levels (a handful), never over rows.  Raises if even the coarsest
  level leaks — silence is the one wrong answer in a privacy gate.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_risk(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Equivalence classes of the quasi-identifier tuple:
    ``(quasi..., n, at_risk)`` with ``at_risk`` = class size < k."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("at_risk", F.col("n") < k)


def generalize_until_k(
    df: DataFrame,
    ladder: Sequence[Mapping[str, Column]],
    k: int,
    max_at_risk: int = 0,
) -> tuple[int, DataFrame]:
    """Return ``(level, classes)`` for the first ladder level whose
    quasi-classes all reach size k (at most ``max_at_risk`` violations
    tolerated).  ``ladder[i]`` maps output column name → the level-i
    generalization expression; every level must declare the same
    column names.  Raises ValueError when no level qualifies."""
    if not ladder:
        raise ValueError("need a non-empty generalization ladder")
    names = list(ladder[0].keys())
    for proj in ladder[1:]:
        if list(proj.keys()) != names:
            raise ValueError(
                f"ladder levels disagree on columns: {names} vs "
                f"{list(proj.keys())}"
            )
    for level, proj in enumerate(ladder):
        g = (
            df.select(*[proj[c].alias(c) for c in names])
            .groupBy(*names)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        n_risk = g.filter(F.col("n") < k).count()
        if n_risk <= max_at_risk:
            return level, g
    raise ValueError(
        f"no ladder level reaches {k}-anonymity "
        f"(last level still has {n_risk} classes below k)"
    )
