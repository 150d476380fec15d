"""ML feature-engineering encoders: leave-one-out target encoding and
the feature-hashing trick.

The last mile of a training-data pipeline is usually turning
high-cardinality categoricals into model food.  Both encoders here
are deterministic and exact, so the same table encoded twice (or on
two engines) is bit-identical — a property sklearn-style fit/transform
pipelines can't give you on distributed input:

- `target_encode_loo`: each row gets the mean target of its category
  EXCLUDING itself (the leakage-free variant).  Computed as
  ``(sum - own) / (n - 1)`` over one partition-only window, with the
  target in integer cents so the subtraction is exact and the single
  division is the only float op (then 4dp `decimal_round`).  ONE
  exchange on the category; no joins.
- `feature_hash`: Weinberger et al.'s hashing trick — each
  ``col=value`` feature maps to ``md5`` → index in ``[0, dim)`` plus
  a ±1 sign bit, emitted as parallel arrays.  Pure expression work at
  scan speed; collisions are the method's documented trade.

No reference counterpart — the training-data family beyond the
reference's scope.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.functions import decimal_round


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "te",
) -> DataFrame:
    """Append ``out_col``: the leave-one-out category mean of
    ``target_col`` (NULL for singleton categories and NULL targets),
    rounded to 4 decimals.  Money-exact: sums run in integer cents."""
    cents = F.floor(F.col(target_col) * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy(cat_col)
    s = F.sum(cents).over(w)
    n = F.count(cents).over(w)
    loo = decimal_round(
        (s - cents).cast("double") / ((n - F.lit(1)) * F.lit(100)).cast("double"),
        4,
    )
    return df.withColumn(
        out_col,
        F.when(cents.isNotNull() & (n > 1), loo),
    )


def rank_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "pr",
) -> DataFrame:
    """Append ``out_col``: the value's percentile rank within its
    group — ``(rank - 1) / (n - 1)`` in [0, 1], RANK semantics (ties
    share the lower rank), NULL values and singleton groups get NULL.
    The rank-transform feature normalizer (the first half of
    rank-gauss, minus the engine-divergent inverse-CDF): integer rank
    and count, one float division, 4dp `decimal_round` — bit-stable
    cross-engine.  One exchange on the group."""
    # nulls LAST explicitly: Spark defaults nulls-first ascending,
    # DuckDB nulls-last — nulls must not shift the non-null ranks
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc_nulls_last()
    )
    wg = Window.partitionBy(group_col)
    nn = F.count(value_col).over(wg)
    pr = decimal_round(
        (F.rank().over(w) - F.lit(1)).cast("double")
        / (nn - F.lit(1)).cast("double"),
        4,
    )
    return df.withColumn(
        out_col,
        F.when(F.col(value_col).isNotNull() & (nn > 1), pr),
    )


def feature_hash(
    df: DataFrame,
    cols: Sequence[str],
    dim: int = 64,
    indices_col: str = "fh_idx",
    signs_col: str = "fh_sign",
) -> DataFrame:
    """Append parallel arrays: for each feature column ``c`` (in the
    given order), index = top-60-bits of ``md5("i:c=value")`` mod
    ``dim`` and sign = ±1 from the next bit — the signed hashing
    trick.  NULL values hash like the literal string "NULL" marker so
    presence/absence is itself a feature."""
    if not cols:
        raise ValueError("need at least one feature column")
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    from crgp_spark.functions import md5_num60

    nums = [
        md5_num60(
            F.concat_ws(
                "=",
                F.lit(f"{i}:{c}"),
                F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")),
            )
        )
        for i, c in enumerate(cols)
    ]
    idx = F.array(*[F.pmod(h, F.lit(dim)).cast("int") for h in nums])
    # sign bit = (h div dim) % 2, computed integer-only via the
    # identity (h div d) % 2 == (h % (2d)) >= d — no float division
    sgn = F.array(
        *[
            F.when(F.pmod(h, F.lit(2 * dim)) >= dim, F.lit(-1))
            .otherwise(F.lit(1))
            .cast("int")
            for h in nums
        ]
    )
    return df.withColumn(indices_col, idx).withColumn(signs_col, sgn)
