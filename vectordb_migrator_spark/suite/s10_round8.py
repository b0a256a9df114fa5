"""Registry family ``s10_round8`` — queries added in round 8."""

from __future__ import annotations

# ruff: noqa: E501
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_migrator_spark.suite._shared import _t, query
from vectordb_migrator_spark.suite.s05_text import _bpe_ctes


def _bpe_segment_arrow_sql(n_merges: int = 8) -> str:
    """Oracle for x0_bpe_segment_arrow: the final ``vocab{n}`` maps
    each word to its SYMBOLS (not just their count), so the segmented
    stream of a document is the position-ordered concatenation of its
    words' symbol lists — md5 over a unit-separator join checks every
    token identity and position, not just counts."""
    n = n_merges
    return (
        _bpe_ctes(n)
        + f""", wsyms AS MATERIALIZED (
      SELECT wid AS word, syms FROM vocab{n}
    ), docw AS (
      SELECT d.doc_id, d.toks[i] AS word, i AS pos
      FROM (SELECT doc_id,
                   list_filter(
                     string_split_regex(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS toks
            FROM documents) d,
           unnest(range(1, len(d.toks) + 1)) u(i)
    ), flat AS (
      SELECT w.doc_id,
             string_agg(array_to_string(m.syms, chr(31)), chr(31)
                        ORDER BY w.pos) AS stream,
             sum(len(m.syms))::BIGINT AS n_tokens
      FROM docw w JOIN wsyms m USING (word)
      GROUP BY w.doc_id
    ), dtok AS (
      SELECT w.doc_id, count(DISTINCT t.s)::BIGINT AS n_distinct
      FROM docw w JOIN wsyms m USING (word), unnest(m.syms) t(s)
      GROUP BY w.doc_id
    )
    SELECT d.doc_id,
           coalesce(f.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(k.n_distinct, 0)::BIGINT AS n_distinct,
           md5(coalesce(f.stream, '')) AS tok_md5
    FROM documents d
    LEFT JOIN flat f USING (doc_id)
    LEFT JOIN dtok k USING (doc_id)
    ORDER BY d.doc_id"""
    )


@query("x0_bpe_segment_arrow", _bpe_segment_arrow_sql(8))
def x0_bpe_segment_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — the PRODUCTION tokenizer apply path (round 8, r7 verdict
    What's-missing #2): fit the 8-merge BPE table (``bpe_learn``),
    then segment EVERY document through the Arrow-batched kernel
    (``bpe_segment_arrow`` — broadcast rank dict, per-batch distinct-
    word cache, one ``mapInPandas`` boundary) instead of
    ``bpe_segment``'s per-merge codegen folds, which its own docstring
    caps at diagnostic merge counts. The md5 over the unit-separator-
    joined token stream makes the oracle check every token identity
    AND position per document — the strongest apply-correctness gate
    expressible as one scalar column. Per-doc token/distinct counts
    ride along for the economics readout. Zero-word docs emit the
    empty stream on both sides (operators/bpe.py:bpe_segment_arrow)."""
    from vectordb_migrator_spark.operators.bpe import (
        bpe_learn,
        bpe_segment_arrow,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_learn(docs, "text", n_merges=8, min_count=2)
    seg = bpe_segment_arrow(docs.select("doc_id", "text"), merges)
    toks = F.coalesce(
        F.col("bpe_tokens"), F.array().cast("array<string>")
    )
    return seg.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.md5(F.concat_ws("\x1f", toks)).alias("tok_md5"),
    ).orderBy("doc_id")
