"""Document chunking (training-data prep): split text into
fixed-size overlapping token windows — the standard pre-embedding /
pre-training segmentation step.

Pure codegen: split → windowed slices via ``transform(sequence)`` →
``posexplode``. One narrow stage; chunking never shuffles (each
document's chunks are produced where the document is read), so at
100 TB the cost is the scan plus the explode's row-count inflation —
exactly the minimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_migrator_spark.functions.text import ws_strip


def chunk_text(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping token windows: chunk i covers tokens
    ``[i*step, i*step + chunk_size)`` with ``step = chunk_size -
    overlap``; the last window may be shorter but every token is
    covered. Output: (id, chunk_id, chunk_text, n_tokens) — one row
    per chunk, deterministic.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("require 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    toks = F.split(F.lower(ws_strip(F.col(text_col))), r"\s+")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_size)).cast("double") / F.lit(step)).cast("int")
        + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(
                F.slice(toks, i * step + 1, chunk_size), " "
            ).alias("chunk_text"),
            F.least(n - i * step, F.lit(chunk_size)).alias("n_tokens"),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c")
    ).select(
        id_col,
        F.col("chunk_id").cast("long"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
    )


def pack_chunks(
    df: DataFrame,
    *,
    budget: int,
    group_col: str = "doc_id",
    order_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Sequence packing: assign consecutive chunks to fixed
    token-budget bins (``pack_id``) — the step that turns variable-
    length chunks into training-context-sized batches.

    Semantics: contiguous offset packing. Within each group, chunks in
    ``order_col`` order fill bins by running token offset — chunk c
    lands in bin ``floor(offset_before_c / budget)``. This is the
    standard vectorized packing (one window cumsum, no iterative
    state); a bin may overflow by at most one chunk, which the trainer
    truncates. True first-fit would need sequential state and cannot
    parallelize.

    One shuffle on ``group_col`` (the window partition); at 100 TB
    packing is shaped exactly like sessionization — partition-local
    running sums, no second exchange.
    """
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offset_after = F.sum(tokens_col).over(w)
    offset_before = offset_after - F.col(tokens_col)
    return df.withColumns(
        {
            "pack_id": F.floor(offset_before / F.lit(budget)).cast("long"),
            "pack_offset": offset_before.cast("long")
            - F.floor(offset_before / F.lit(budget)).cast("long") * budget,
        }
    )
