"""Influence-edge sinks (SURVEY.md §2.1 O9; reference
``timely_extensions/operators/write.rs:38-114``).

The engine-native sink is a PARTITIONED parquet write — the reference's
all-edges-to-worker-0 funnel (``write.rs:45``) is a serial bottleneck we
deliberately do not replicate (SURVEY.md §4). ``write_cascades_csv``
exists for byte-format parity with the reference's ``cascs.csv``:
``cascade_id;retweet_id;influencee;influencer;timestamp;-1`` with its
constant trailing ``-1`` (``social_graph/influence_edge.rs:62-68``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cascade_lines(edges: DataFrame) -> DataFrame:
    """Format reference-shaped edges ``(cascade_id, retweet_id,
    influencee, influencer, ts, ...)`` as single-column cascs.csv lines
    (``influence_edge.rs:62-68``)."""
    return edges.select(
        F.concat_ws(
            ";",
            F.col("cascade_id"),
            F.col("retweet_id"),
            F.col("influencee"),
            F.col("influencer"),
            F.col("ts"),
            F.lit("-1"),
        ).alias("value")
    )


def write_cascades_csv(
    edges: DataFrame, path: str, single_file: bool = False
) -> None:
    """Write edges in the reference's cascs.csv line format.

    ``single_file=True`` reproduces the reference's one-file output via
    ``coalesce(1)`` — ONLY for small parity fixtures; production writes
    stay partitioned."""
    lines = cascade_lines(edges)
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


def write_edges(edges: DataFrame, path: str, partitions: int | None = None) -> None:
    """Engine-native partitioned edge-table write (Iceberg-layout
    parquet; SURVEY.md R4 catalog shim)."""
    df = edges
    if partitions:
        df = df.repartition(partitions, "conv_id")
    df.write.mode("overwrite").parquet(path)
