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


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking — the RAG-ingestion complement
    of `sequence_pack` (packing lays documents onto training sequences;
    chunking splits documents into retrieval units).  Windows of
    ``chunk_tokens`` whitespace tokens start every ``chunk_tokens -
    overlap`` tokens, with the LAST start capped at ``n -
    chunk_tokens`` (the standard chunker rule: without the cap a
    trailing window can be a strict subset of the previous one,
    bloating the retrieval index).  Documents shorter than a window
    yield one short chunk; empty documents yield none.  Returns
    ``(id_col, chunk_idx, start_tok, n_toks, chunk_text)``.

    Scale shape: pure array expressions (split once, slice per
    window) exploded to one row per chunk — scan speed, no shuffle,
    no UDF; fan-out is len/stride, the output's own size.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # max chunk index: 0 when n <= chunk_tokens, else enough strides to
    # reach the capped final start
    last_idx = F.when(n <= chunk_tokens, F.lit(0).cast("long")).otherwise(
        F.floor((n - chunk_tokens - 1) / F.lit(stride)) + 1
    )
    start = lambda i: F.greatest(  # noqa: E731
        F.least(i * stride, n - chunk_tokens), F.lit(0)
    )
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0).cast("long"), last_idx),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                start(i).cast("int").alias("start_tok"),
                F.slice(toks, start(i) + 1, chunk_tokens).alias("_w"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_idx:int,start_tok:int,_w:array<string>>>"
    ))
    return docs.select(id_col, F.explode(chunks).alias("_c")).select(
        id_col,
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.col("_c.start_tok").alias("start_tok"),
        F.size("_c._w").alias("n_toks"),
        F.array_join("_c._w", " ").alias("chunk_text"),
    )
