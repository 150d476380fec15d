"""Column-expression helpers shared engine-wide. All JVM-side
(``pyspark.sql.functions``) — no Python UDFs here."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def participant(role: Column | str = "role", tool: Column | str = "tool") -> Column:
    """Effective participant of a turn: ``coalesce(nullif(tool,''), role)``
    (BASELINE.json input_hint / SURVEY.md §7.1)."""
    role_c = F.col(role) if isinstance(role, str) else role
    tool_c = F.col(tool) if isinstance(tool, str) else tool
    return F.coalesce(F.nullif(tool_c, F.lit("")), role_c)


def ts_micros(ts: Column | str = "ts") -> Column:
    """Timestamp → integer microseconds, the engine's ordering-math type
    (the reference uses plain integer epochs, ``twitter/tweet.rs:23-24``)."""
    ts_c = F.col(ts) if isinstance(ts, str) else ts
    # Parquet TIMESTAMP_NTZ columns (Spark 4 infers NTZ) are cast to
    # TIMESTAMP first; the session timezone is pinned to UTC
    # (session.py), so the mapping is deterministic and order-preserving.
    return F.unix_micros(ts_c.cast("timestamp"))


def vid(conv_id: Column | str, turn_idx: Column | str) -> Column:
    """64-bit vertex id for a turn: ``xxhash64(conv_id, turn_idx)``.

    Matches the reference's integer-ID vertex model (``UserID = i64``,
    ``twitter/mod.rs:21``) while staying derivable without a global
    id-assignment shuffle. At 10^12 turns the expected number of 64-bit
    collisions is ~3e4 (birthday bound); callers that need zero collisions
    at that scale should keep the natural key ``(conv_id, turn_idx)``
    alongside, which every engine table does.
    """
    c = F.col(conv_id) if isinstance(conv_id, str) else conv_id
    t = F.col(turn_idx) if isinstance(turn_idx, str) else turn_idx
    return F.xxhash64(c, t)


def decimal_round(col: Column, places: int) -> Column:
    """Deterministic cross-engine rounding: ``floor(x·10^p + 0.5)/10^p``.

    Spark's ``F.round`` (exact BigDecimal HALF_UP of the double) and
    DuckDB's ``round`` (``std::round(x·10^p)/10^p`` in floating point)
    disagree when the true value lies on a rounding boundary (e.g.
    0.83125 at p=4). This idiom is the same IEEE op sequence in both
    engines, so oracle comparisons are bit-stable; SQL twin:
    ``FLOOR(x * 10^p + 0.5) / 10^p``."""
    scale = F.lit(float(10**places))
    return F.floor(col * scale + F.lit(0.5)) / scale


def salt_for(src: Column | str, dst: Column | str, n_salt: Column) -> Column:
    """Salt replica index for an edge: splits a hub source's out-adjacency
    across ``n_salt`` partitions by hashing the *destination*, so the same
    (src, salt) pair always lands together but a hub fans out
    (SURVEY.md R1; the degree-adaptive analog of the reference's per-key
    probe-side choice, ``reconstruct.rs:79``)."""
    s = F.col(src) if isinstance(src, str) else src
    d = F.col(dst) if isinstance(dst, str) else dst
    return F.pmod(F.xxhash64(d, s), n_salt).cast("int")


def part_id(src: Column | str, salt: Column | str, n_parts: int) -> Column:
    """Graph partition of an edge: salted hash of src (north rule)."""
    s = F.col(src) if isinstance(src, str) else src
    sa = F.col(salt) if isinstance(salt, str) else salt
    return F.pmod(F.xxhash64(s, sa), F.lit(n_parts)).cast("int")


def ord_key(*cols: Column | str, width: int = 20) -> Column:
    """Zero-padded ``:``-joined composite ordering key — the engine's
    one idiom for deterministic argmin/argmax over multiple NON-NEGATIVE
    integer columns (lexicographic == numeric only when every component
    is >= 0 and fits ``width`` digits).  SQL twin:
    ``LPAD(CAST(c AS VARCHAR), 20, '0') || ':' || ...`` — DuckDB's
    ARG_MIN/ARG_MAX take no struct keys, which is why this exists."""
    parts = [
        F.lpad((F.col(c) if isinstance(c, str) else c).cast("string"),
               width, "0")
        for c in cols
    ]
    return F.concat_ws(":", *parts)


def md5_num60(col: Column | str) -> Column:
    """BIGINT from the top 15 hex digits (60 bits) of ``md5(col)`` —
    the engine's deterministic cross-engine hash-to-integer idiom
    (sketches, Bloom filters, feature hashing).  SQL twin: the
    ``_hex15_num`` INSTR expansion in ``__spark_entry__.py`` (DuckDB
    1.0 has no hex→int cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
