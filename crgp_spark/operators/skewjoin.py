"""Explicit salted equi-join for skewed keys.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) only splits
partitions it can SEE are skewed at shuffle time, and only for
sort-merge joins; this operator is the explicit, planner-independent
version of the same trade — the one to reach for when a handful of
hot keys (hub users, null-ish defaults, celebrity vertices) would
otherwise pin a 1000-executor shuffle on three tasks.  It is the
relational twin of the graph layout's hub-splitting
(`cascade.py` salted sub-blocks, `pack.py` salted-src partitioning).

Mechanics: every left row gets a deterministic salt in ``[0,
n_salts)`` hashed from the whole row (xxhash64 — content-derived, so
re-runs place rows identically); the right side is replicated
``n_salts``× with an exploded sequence; the join key becomes ``(key,
salt)``, spreading each hot key over ``n_salts`` shuffle partitions.
Join semantics are preserved exactly for ``inner`` and ``left``: each
left row sees precisely the one replica matching its salt, so
multiplicities are unchanged (proven against the plain join in
tests).

Cost model: right side shuffles ``n_salts``× its size — use for
big×medium joins where the medium side is too large to broadcast but
``n_salts × |right|`` still beats the latency of a skew-pinned
straggler.  (Small right sides should broadcast instead — then no
shuffle exists to skew; `bloomjoin` covers the big×selective case.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (skewed side) with ``right`` on column
    ``on`` spread over ``n_salts`` sub-keys.  Returns the same rows,
    multiplicities and columns as ``left.join(right, on, how)``."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join preserves semantics for inner/left only, got {how}"
        )
    from pyspark.sql.types import MapType

    # hash only hashable columns (xxhash64 rejects MapType), and pick
    # a salt column name free on BOTH sides
    hashable = [
        f.name
        for f in left.schema.fields
        if not isinstance(f.dataType, MapType)
    ]
    if not hashable:
        raise ValueError("left side has no hashable (non-map) columns")
    sc = "_salt"
    taken = set(left.columns) | set(right.columns)
    while sc in taken:
        sc += "_"
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(n_salts))
    lsalted = left.withColumn(sc, salt.cast("int"))
    rrep = right.withColumn(
        sc, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = lsalted.join(rrep, [on, sc], how)
    return out.drop(sc)
