"""Sorted-neighborhood dedup (SNM): sort-key blocking for fuzzy matching.

The third classic blocking family next to LSH (`dedup.py`) and deletion
neighborhoods (`fuzzy.py`): Hernandez & Stolfo's sorted-neighborhood
method sorts records by a normalized key and compares each record only
with its ``window - 1`` successors in the sort order, turning the
quadratic all-pairs comparison into a linear sliding window.  It is the
standard entity-resolution pass when near-duplicates share a common
prefix (titles, addresses, normalized names) rather than shingle
overlap — the case LSH blocking handles poorly because the differing
tail dominates the shingle set.

Semantics (oracle-exact): order all records by ``(key, id)`` where
``key = substring(lower(text), 1, key_len)``; for every record at
global position ``p``, compare against positions ``p+1 .. p+window-1``;
emit the pair when ``levenshtein(key_a, key_b) <= max_dist``
(``levenshtein`` has identical integer semantics in Spark and DuckDB).

Scale shape at 100 TB — the naive formulation is NOT scalable (a
``row_number`` over the whole table is a single-partition window), so
the global position is computed in two distributed levels:

1. records hash into prefix blocks (``substring(key, 1, block_len)``);
   a *partitioned* window ranks within each block — fully parallel;
2. block offsets come from a metadata-sized table (one row per distinct
   prefix, cumulative count over the tiny table) broadcast back, so
   ``pos = block_offset + rank_in_block`` reproduces the global sort
   position with zero global sorts;
3. neighbor pairing is an EQUI-join: each record explodes into
   ``window - 1`` probe positions and joins the position table on the
   exact position — Catalyst plans a plain shuffled hash join keyed on
   a dense long, no range join, no skew (every position is unique).

Per-comparison cost is bounded by ``key_len`` (levenshtein on the
normalized key, never the full document), so the verify stays O(k²)
per pair regardless of document length.

Reference parity: the reference engine has no fuzzy matching; this is
part of the training-data curation family layered on the same
documents table as `dedup.py` (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snm_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_len: int = 16,
    block_len: int = 4,
    window: int = 6,
    max_dist: int = 5,
) -> DataFrame:
    """All pairs within ``window - 1`` positions of the global
    ``(key, id)`` sort order whose normalized keys are within
    ``max_dist`` edits.  Returns ``(doc_a, doc_b, dist)`` with
    ``doc_a`` the earlier record in sort order."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if not 1 <= block_len <= key_len:
        raise ValueError("need 1 <= block_len <= key_len")

    keyed = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.substring(F.lower(F.col(text_col)), 1, key_len).alias("_key"),
        )
        .withColumn("_blk", F.substring("_key", 1, block_len))
    )

    # Level 2: block offsets — one row per distinct prefix.  The window
    # below runs over this metadata-sized table (bounded by the prefix
    # alphabet, not by |docs|), never over the data.
    w_off = Window.orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        keyed.groupBy("_blk")
        .count()
        .select(
            "_blk",
            F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("_off"),
        )
    )

    # Level 1: rank within block (partitioned window — parallel), then
    # the broadcast offset join reconstructs the global position.
    w_blk = Window.partitionBy("_blk").orderBy("_key", "_id")
    pos = (
        keyed.withColumn("_rn", F.row_number().over(w_blk))
        .join(F.broadcast(offsets), "_blk")
        .select(
            "_id", "_key", (F.col("_off") + F.col("_rn")).alias("_pos")
        )
    )

    probes = pos.select(
        F.col("_id").alias("doc_a"),
        F.col("_key").alias("_key_a"),
        F.explode(
            F.sequence(F.col("_pos") + 1, F.col("_pos") + (window - 1))
        ).alias("_pos"),
    )
    pairs = probes.join(
        pos.select(
            F.col("_pos"),
            F.col("_id").alias("doc_b"),
            F.col("_key").alias("_key_b"),
        ),
        "_pos",
    )
    return (
        pairs.withColumn("dist", F.levenshtein("_key_a", "_key_b"))
        .filter(F.col("dist") <= max_dist)
        .select("doc_a", "doc_b", "dist")
    )
