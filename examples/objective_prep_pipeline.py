"""Training-objective data prep — the round-12 transforms as one
pipeline: the pass that turns a cleaned text corpus into the actual
(input, target) pairs a mixed-objective LM run consumes (UL2 / FIM
recipes mix causal, infilling, and denoising examples in fixed
proportions).

1. **Route** — every document draws one deterministic md5 coin and
   lands in exactly one objective stream: plain causal LM (~40%),
   fill-in-the-middle (~30%), or T5-style span corruption (~30%).
   The same document routes identically on any engine, any retry.
2. **Transform** — FIM docs reorder as ``<PRE> prefix <SUF> suffix
   <MID> middle`` (`operators/chunking.py:fim_transform`, applied to
   ALL routed docs via fim_rate=1); span docs mask md5-coin token
   runs into numbered sentinels with the dropped spans as the target
   (`operators/cleaning.py:span_corruption`); causal docs pass
   through. All three are per-row rewrites or per-document windows —
   no corpus-wide shuffle is introduced by the objectives themselves.
3. **Unify** — one (doc_id, objective, n_tokens, input_text,
   target_text) frame; causal/FIM targets are NULL (the trainer
   shifts inputs), span targets carry the sentinel spans.
4. **Pack** — contiguous token-budget packing per objective stream
   (`operators/chunking.py:pack_chunks`, budget 256): the windowed
   cumsum that turns ragged documents into context-sized training
   rows, exactly like sessionization at 100 TB.

Usage:
    python examples/objective_prep_pipeline.py [documents.parquet]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, functions as F

from vectordb_migrator_spark.operators.chunking import (
    fim_transform,
    pack_chunks,
)
from vectordb_migrator_spark.operators.cleaning import span_corruption


def run_pipeline(docs: DataFrame, *, budget: int = 256) -> DataFrame:
    """Route → transform → unify → pack. Returns one row per packed
    document: (objective, pack_id, doc_id, n_tokens, pack_offset,
    input_text, target_text), ordered."""
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("obj:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    routed = docs.select("doc_id", "text", coin.alias("__c"))
    clm = routed.filter(F.col("__c") < 40)
    fim = routed.filter((F.col("__c") >= 40) & (F.col("__c") < 70))
    span = routed.filter(F.col("__c") >= 70)

    clm_out = clm.select(
        "doc_id",
        F.lit("clm").alias("objective"),
        F.size(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).cast("long").alias("n_tokens"),
        F.col("text").alias("input_text"),
        F.lit(None).cast("string").alias("target_text"),
    )
    fim_out = fim_transform(fim, fim_rate=1).select(
        F.col("id").alias("doc_id"),
        F.lit("fim").alias("objective"),
        F.col("n_tok").alias("n_tokens"),
        F.col("psm").alias("input_text"),
        F.lit(None).cast("string").alias("target_text"),
    )
    span_out = span_corruption(span).select(
        F.col("id").alias("doc_id"),
        F.lit("span").alias("objective"),
        "n_tokens",
        "input_text",
        "target_text",
    )
    unified = clm_out.unionByName(fim_out).unionByName(span_out)
    packed = pack_chunks(
        unified,
        budget=budget,
        group_col="objective",
        order_col="doc_id",
        tokens_col="n_tokens",
    )
    return packed.select(
        "objective",
        "pack_id",
        "doc_id",
        "n_tokens",
        "pack_offset",
        "input_text",
        "target_text",
    ).orderBy("objective", "pack_id", "doc_id")


def main() -> None:
    from vectordb_migrator_spark.session import get_spark

    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.01/documents.parquet"
    )
    spark = get_spark("objective-prep", cpus=8)
    out = run_pipeline(spark.read.parquet(path))
    out.groupBy("objective").agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("pack_id").alias("packs"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("objective").show(truncate=False)
    out.show(6, truncate=60)


if __name__ == "__main__":
    main()
