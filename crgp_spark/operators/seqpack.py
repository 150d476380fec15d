"""Sequence packing: map a document shard onto fixed-token-budget
training sequences.

LLM pre-training concatenates documents within a shard and chunks the
token stream into fixed-length sequences (GPT-style "packed"
batching); the batch-side job is computing, for every document, WHICH
sequence (bin) it starts in and at what offset — the manifest the
tokenizer/loader consumes.  This is the contiguous-stream formulation
(documents may straddle a bin boundary; the loader splits them), not
bin-packing — deterministic, order-preserving, and exactly what the
"concat-and-chunk" loaders expect.

Plan shape: one token-count projection at scan speed, then ONE window
``SUM`` partitioned by the shard column and ordered by ``doc_id`` —
the window never sees more than a shard, so there is no global-sort /
single-partition hazard; shards are the unit of parallelism exactly as
they are on the real pipeline (a 100 TB corpus = many shards, each a
partition-local prefix sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crgp_spark.operators.textstats import tokens


def sequence_pack(
    docs: DataFrame,
    budget: int = 256,
    text_col: str = "text",
    part_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Returns ``(id_col, part_col, n_tokens, bin, offset)``: documents
    ordered by ``id_col`` within each ``part_col`` shard are laid onto
    a contiguous token stream; ``bin`` = which ``budget``-token
    sequence the document STARTS in, ``offset`` = its start position
    inside that bin (whitespace token counts)."""
    n = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = docs.select(id_col, part_col, n.alias("n_tokens"))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return base.select(
        id_col,
        part_col,
        "n_tokens",
        F.floor(start / F.lit(budget)).cast("long").alias("bin"),
        (start % F.lit(budget)).alias("offset"),
    )
