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


def fim_transform(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    fim_rate: int = 2,
    pre_tok: str = "<PRE>",
    suf_tok: str = "<SUF>",
    mid_tok: str = "<MID>",
) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022):
    for a deterministic md5-coin fraction (1/``fim_rate``) of
    documents, pick two content-keyed split points u <= v over the
    token stream and emit PSM order — ``<PRE> prefix <SUF> suffix
    <MID> middle`` — so an autoregressive LM learns infilling from
    plain left-to-right loss; the rest pass through unchanged. Splits
    and the apply-coin hash the DOC ID (md5 + base-16 conv, the
    engine-reproducible twin convention), so the same document gets
    the same transform on every run, engine, and retry — the property
    a resumable 100 TB preprocessing job needs.

    Pure codegen: tokenize once, three ``F.slice`` segments, sentinel
    concat via flattened array join — no explode, no shuffle, no
    Python. Returns (id, fim, n_tok, u, v, psm) with u/v NULL on
    pass-through rows; ``psm`` is the training-ready string."""

    def h(tag):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    toks = F.filter(
        F.split(F.lower(ws_strip(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("__t"),
        (h("fim:") % F.lit(fim_rate) == 0).alias("__apply"),
    ).withColumn("n_tok", F.size("__t").cast("long"))

    def cut(tag):
        raw = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col("id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return raw % (F.col("n_tok") + 1)

    cut1, cut2 = cut("fimu:"), cut("fimv:")
    u = F.least(cut1, cut2)
    v = F.greatest(cut1, cut2)
    pre = F.slice("__t", F.lit(1), u)
    mid = F.slice("__t", u + 1, v - u)
    suf = F.slice("__t", v + 1, F.col("n_tok") - v)
    psm_arr = F.concat(
        F.array(F.lit(pre_tok)),
        pre,
        F.array(F.lit(suf_tok)),
        suf,
        F.array(F.lit(mid_tok)),
        mid,
    )
    return base.select(
        "id",
        F.col("__apply").cast("long").alias("fim"),
        "n_tok",
        F.when(F.col("__apply"), u).alias("u"),
        F.when(F.col("__apply"), v).alias("v"),
        F.when(F.col("__apply"), F.array_join(psm_arr, " "))
        .otherwise(F.array_join("__t", " "))
        .alias("psm"),
    )
