"""Per-conversation structural virality (radius-capped Wiener index).

Goel, Anderson, Hofman & Watts 2016 define structural virality of a
cascade as the mean pairwise geodesic distance of its diffusion tree:
a star (one broadcaster) scores ~2, a long chain (person-to-person
spread) scores ~n/3 — THE standard scalar separating broadcast-shaped
from virally-shaped conversations, and a direct consumer of the
influence edges this engine derives (the reference's cascades are
exactly these trees, ``reconstruct.rs:37-134``).

Exact all-pairs distance is quadratic, so like `harmonic.py` (whose
level-set machinery this reuses wholesale) the radius is bounded: the
operator reports, per conversation, the number of vertex pairs within
``radius`` hops and their total/mean distance.  On conversation trees
of bounded depth the capped value IS the exact Wiener index; deeper
cascades get the standard truncated estimate.

Cross-engine exactness: everything is derived from the integer level
counts ``n_d(v)`` that `cascade_harmonic`/`harmonic_bounded` already
emit bit-exactly.  ``wiener2 = Σ_v Σ_d d·n_d(v)`` and ``pairs2 = Σ_v
Σ_d n_d(v)`` are BIGINT sums counting each unordered pair twice
(symmetry), halved with integer division; the mean is ONE double
division passed through ``decimal_round`` — the module family's
contract.

Scale shape at 100 TB: the heavy lifting is `cascade_harmonic`'s
one-pass conversation-local kernel (oversized conversations take the
generic distributed level-set path); on top of it this adds one
broadcast-sized vertex→conversation join and one map-side-combinable
``groupBy(conv_id)`` — nothing quadratic, no new shuffle shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crgp_spark.config import EngineConfig
from crgp_spark.functions import decimal_round
from crgp_spark.operators.harmonic import cascade_harmonic


def structural_virality(
    spark: SparkSession,
    edges: DataFrame,
    radius: int = 3,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """``edges`` = ``(src, dst, conv_id)`` with vids unique per
    conversation (every derivation output).  Returns one row per
    conversation with at least one edge: ``(conv_id, n_vertices,
    n_pairs, wiener, mean_dist)`` where ``n_pairs``/``wiener`` count
    unordered within-``radius`` pairs and their total distance, and
    ``mean_dist = wiener / n_pairs`` rounded to 6 decimals."""
    counts = cascade_harmonic(spark, edges, radius=radius, cfg=cfg)
    vmap = (
        edges.select("conv_id", F.col("src").cast("long").alias("vid"))
        .unionByName(
            edges.select("conv_id", F.col("dst").cast("long").alias("vid"))
        )
        .distinct()
    )
    # the per-vid level counts come back WITHOUT conv_id, so the join
    # below needs vids unique ACROSS conversations, a stronger contract
    # than the kernel's per-conversation uniqueness — fail loudly
    # rather than silently cross-match (driver vid encoding
    # uid*100000+turn satisfies it)
    if not vmap.groupBy("vid").count().filter(F.col("count") > 1).isEmpty():
        raise ValueError(
            "structural_virality requires vids unique across "
            "conversations; re-encode vids (e.g. conv_key * K + turn)"
        )
    pairs2 = None
    wiener2 = None
    for d in range(1, radius + 1):
        c = F.col(f"cnt_d{d}").cast("long")
        pairs2 = c if pairs2 is None else pairs2 + c
        wiener2 = c * d if wiener2 is None else wiener2 + c * d
    per_v = counts.join(vmap, "vid").select(
        "conv_id", pairs2.alias("_p2"), wiener2.alias("_w2")
    )
    agg = per_v.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_vertices"),
        F.sum("_p2").alias("_p2"),
        F.sum("_w2").alias("_w2"),
    )
    return agg.select(
        "conv_id",
        "n_vertices",
        F.expr("_p2 div 2").alias("n_pairs"),
        F.expr("_w2 div 2").alias("wiener"),
        F.when(F.col("_p2") > 0, decimal_round(
            F.col("_w2").cast("double") / F.col("_p2").cast("double"), 6
        )).otherwise(F.lit(None).cast("double")).alias("mean_dist"),
    )
