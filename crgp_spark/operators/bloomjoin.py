"""Declarative Bloom-filter semi-join (the "bloom join" of Polybase /
Impala runtime filters, and of Spark's own
``spark.sql.optimizer.runtimeFilter.bloomFilter`` — re-expressed here
as explicit, deterministic DataFrame ops so the pre-filter is
plan-visible, engine-agnostic and oracle-checkable).

Why this matters at 100 TB: a semi-join of a huge probe table against a
selective build side normally shuffles EVERY probe row on the join key
before any row can be dropped.  A Bloom filter built from the small
side and broadcast to the scan turns that into: probe rows die at the
map side with no exchange, and only the surviving sliver pays the
shuffle of the exact join.  The filter is lossy (false positives) but
the operator composes it with a final exact semi-join, so the RESULT is
exact regardless of filter sizing — the filter only controls how much
work the exchange does.

Construction is pure DataFrame algebra, no UDFs:

- ``n_hashes`` bit positions per key, each ``md5(i ":" key)``'s top 15
  hex digits (60 bits, BIGINT-exact in Spark and DuckDB) mod
  ``m_bits``;
- the bit array is a table ``(word_idx, word)`` of 64-bit words,
  aggregated with the map-side-combinable ``bit_or`` — at most
  ``m_bits / 64`` rows, e.g. 2 KiB of longs for the default 2^17 bits;
- probing is ``n_hashes`` consecutive BROADCAST hash joins of the word
  table (inner join on ``word_idx`` + a bit test): zero exchanges on
  the probe side, whole-stage-codegen friendly, and a missing word
  kills the row immediately.

Sizing: ~10 bits per distinct build key gives ~1 % false positives
with 4 hashes.  The word table must broadcast, so this operator targets
build sides up to ~100 M keys (2^30 bits = 128 MiB of words); beyond
that, prefer Spark's native runtime filter or partition both sides.

No reference-repo counterpart (the reference joins exactly); this is a
scale-path operator for the LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default filter size: 2^17 bits = 2048 words = 16 KiB broadcast
DEFAULT_M_BITS = 1 << 17
DEFAULT_N_HASHES = 4


def _check_sizing(m_bits: int, n_hashes: int) -> None:
    if m_bits <= 0 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    if not 1 <= n_hashes <= 16:
        raise ValueError(f"n_hashes must be in [1, 16], got {n_hashes}")


def _bit_pos(key: F.Column, i: int, m_bits: int) -> F.Column:
    """Deterministic bit position #i for a key: md5 top-60-bits mod m."""
    from crgp_spark.functions import md5_num60

    h = md5_num60(F.concat_ws(":", F.lit(str(i)), key.cast("string")))
    return F.pmod(h, F.lit(m_bits))


def bloom_filter_table(
    build: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Build the filter as a ``(word_idx: long, word: long)`` table —
    the set bits of the Bloom filter packed into 64-bit words.  The
    aggregation is ``bit_or``, a commutative-monoid combine, so it is
    map-side partial and the filter is mergeable across days/tenants
    exactly like `sketch.kmv_merge`."""
    _check_sizing(m_bits, n_hashes)
    key = F.col(key_col)
    positions = F.array(*[_bit_pos(key, i, m_bits) for i in range(n_hashes)])
    return (
        build.where(key.isNotNull())
        .select(F.explode(positions).alias("pos"))
        .selectExpr(
            "pos DIV 64 AS word_idx",
            "SHIFTLEFT(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS bit",
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_prefilter(
    probe: DataFrame,
    words: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Drop probe rows the filter proves absent: ``n_hashes``
    broadcast inner joins on ``word_idx`` + a bit test each.  All
    map-side — no exchange on the probe table.  Keeps all probe
    columns; may keep false positives (bounded by filter sizing)."""
    _check_sizing(m_bits, n_hashes)
    key = F.col(key_col)
    out = probe.where(key.isNotNull())
    for i in range(n_hashes):
        pos = _bit_pos(key, i, m_bits)
        w = F.broadcast(
            words.select(
                F.col("word_idx").alias(f"_wi{i}"),
                F.col("word").alias(f"_wd{i}"),
            )
        )
        out = (
            out.withColumn(f"_p{i}", pos)
            .join(w, F.expr(f"_p{i} DIV 64") == F.col(f"_wi{i}"), "inner")
            .where(
                F.expr(
                    f"(SHIFTRIGHTUNSIGNED(_wd{i},"
                    f" CAST(_p{i} % 64 AS INT)) & 1) = 1"
                )
            )
            .drop(f"_p{i}", f"_wi{i}", f"_wd{i}")
        )
    return out


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    exact: bool = True,
) -> DataFrame:
    """EXACT semi-join of ``probe`` against ``build``'s keys, with a
    Bloom pre-filter carrying the scale load: probe rows the filter
    rejects never reach the exchange of the final exact join.  With
    ``exact=False`` returns just the pre-filtered candidates
    (superset semantics) for callers composing their own verification
    — mirrors `dedup.lsh_candidate_pairs`' candidates/verify split."""
    build_key = build_key or probe_key
    words = bloom_filter_table(build, build_key, m_bits, n_hashes)
    candidates = bloom_prefilter(probe, words, probe_key, m_bits, n_hashes)
    if not exact:
        return candidates
    keys = build.select(F.col(build_key).alias(probe_key)).where(
        F.col(probe_key).isNotNull()
    )
    return candidates.join(keys, probe_key, "left_semi")
