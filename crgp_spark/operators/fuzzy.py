"""Edit-distance-1 fuzzy self-join via deletion neighborhoods (FastSS).

The entity-resolution primitive: find all pairs of strings one edit
apart (typo'd handles, near-identical domains, OCR'd tokens) WITHOUT
the quadratic all-pairs comparison.  FastSS (Bocek et al. 2007)
observes that two strings within edit distance 1 always share a member
of their deletion neighborhoods — the string itself plus every
one-character deletion — so blocking on those variants finds every
true pair, and the exact ``levenshtein`` check (identical integer
semantics in Spark and DuckDB) discards the false candidates.

Scale shape at 100 TB: per string ``len+1`` variant rows (bounded by
``max_len``), one self-join keyed on the variant — a bucketed hash
join whose fan-out is the neighborhood collision count, never |S|² —
then a map-side ``distinct`` and the verify filter.  This is exactly
how production fuzzy joins block (deletion neighborhoods / q-gram
prefixes), expressed as two shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs_ed1(
    strings: DataFrame, col: str = "s", max_len: int = 64
) -> DataFrame:
    """``strings``: a one-column frame of DISTINCT strings.  Returns
    every unordered pair at edit distance exactly 1 as ``(s1, s2)``
    with ``s1 < s2``.  Strings longer than ``max_len`` are ignored
    (documented blocking bound: variant fan-out stays linear)."""
    s = (
        strings.select(F.col(col).alias("s"))
        .filter(F.length("s").between(1, max_len))
        .distinct()
    )
    # variant list: the string itself (i=0) plus every 1-char deletion;
    # plain SQL expr so the DuckDB twin is a transliteration
    ex = s.select(
        "s",
        F.explode(
            F.expr(
                "transform(sequence(0, length(s)), i -> "
                "CASE WHEN i = 0 THEN s "
                "ELSE concat(substring(s, 1, i - 1), substring(s, i + 1)) END)"
            )
        ).alias("v"),
    ).distinct()
    a = ex.select(F.col("s").alias("s1"), "v")
    b = ex.select(F.col("s").alias("s2"), "v")
    cand = (
        a.join(b, "v")
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    return cand.filter(F.levenshtein("s1", "s2") == 1)
