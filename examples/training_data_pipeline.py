"""End-to-end training-data curation with the flat operator API.

The composition every pre-training data pipeline runs, spelled with
this package's operators (each one oracle-verified in the suite):

    quality gate → exact dedup → near-dup dedup (detect → cluster →
    apply) → repeated-span removal → chunk → pack → manifest split

Everything stays ONE lazy DataFrame DAG until the final write; at
100 TB the same code runs unchanged — the operators' shuffles are all
key-sized (hashes, ids, gram keys), never payload-sized.

Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def build_training_set(spark, sf_dir: str):
    from vectordb_migrator_spark.functions.text import token_count_ws
    from vectordb_migrator_spark.operators import (
        apply_dedup,
        chunk_text,
        connected_components,
        exact_text_dedup,
        ngram_jaccard_pairs,
        pack_chunks,
        remove_repeated_spans,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. quality gate — prune before anything shuffles
    kept = docs.filter(token_count_ws("text") >= 20)

    # 2. exact dedup — md5 fingerprint, min-id survivor
    keep_ids = exact_text_dedup(kept).select(F.col("keep_id").alias("doc_id"))
    uniq = kept.join(keep_ids, "doc_id", "left_semi")

    # 3. near-dup dedup — detect pairs, cluster, keep one rep/cluster
    pairs = ngram_jaccard_pairs(uniq, n=3, threshold=0.2)
    survivors = apply_dedup(uniq, connected_components(pairs))

    # 4. cross-document repeated-span removal (keep-first)
    cleaned = remove_repeated_spans(survivors, n=8).withColumnRenamed(
        "clean_text", "text"
    )

    # 5. chunk + pack into token budgets
    packed = pack_chunks(
        chunk_text(cleaned, chunk_size=128, overlap=16), budget=512
    )
    return packed


def main() -> int:
    from vectordb_migrator_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_set_out"
    spark = get_spark("training-data-pipeline")
    packed = build_training_set(spark, sf_dir)
    packed.write.mode("overwrite").parquet(out)
    print(f"wrote {spark.read.parquet(out).count()} packed chunks to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
