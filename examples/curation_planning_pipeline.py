"""Curation PLANNING with the round-7 operators — the pass a data
team runs BEFORE committing a 100 TB training-data build: gate the
corpus against its contract, grade readability, price the batching,
fit the tokenizer economics, and compute mixture weights net of
duplication. Every stage is a lazy DataFrame and every operator is
oracle-verified in the suite; nothing here collects more than
model/report-sized frames.

    contract gate (quarantine triage)
      → readability banding
      → sequence-length bucket economics
      → tokenizer fit + per-source token pricing
      → dedup-aware mixture (weights net of near-dups)

Run: python examples/curation_planning_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def plan_curation(spark, sf_dir: str) -> dict:
    """Returns {report_name: DataFrame} — the planning dossier."""
    from vectordb_migrator_spark.functions.text import (
        flesch_reading_ease,
        token_count_ws,
    )
    from vectordb_migrator_spark.operators.bpe import (
        bpe_learn,
        bpe_vocab_map,
    )
    from vectordb_migrator_spark.operators.dedup import (
        apply_dedup,
        ngram_jaccard_pairs,
    )
    from vectordb_migrator_spark.operators.graph import connected_components
    from vectordb_migrator_spark.operators.slicing import source_mixture
    from vectordb_migrator_spark.operators.validation import (
        enforce_rules,
        quarantine_summary,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. contract gate — route instead of crash; triage by combination
    rules = [
        ("has_text", token_count_ws("text") >= 1),
        ("known_lang", F.col("lang").isin("en", "de", "es", "fr", "pt")),
        ("id_present", F.col("doc_id").isNotNull()),
    ]
    triage = quarantine_summary(docs, rules)
    clean = enforce_rules(docs, rules).filter(
        F.size("violations") == 0
    ).drop("violations")

    # 2. readability mix — how hard is this corpus to read?
    readability = (
        clean.select(flesch_reading_ease("text").alias("r"))
        .select(F.col("r.flesch").alias("flesch"))
        .select(
            F.when(F.col("flesch") >= 70, "easy")
            .when(F.col("flesch") >= 30, "medium")
            .otherwise("hard")
            .alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("long").alias("docs"))
    )

    # 3. batching economics — what does padding cost per bucket?
    n = token_count_ws("text").cast("long")
    eff = F.least(n, F.lit(1024))
    edge = (
        F.when(eff <= 128, 128)
        .when(eff <= 512, 512)
        .otherwise(1024)
        .cast("long")
    )
    buckets = (
        clean.select(edge.alias("bucket"), eff.alias("eff"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            (F.first("bucket") * F.count(F.lit(1)) - F.sum("eff")).alias(
                "pad_tokens"
            ),
        )
    )

    # 4. tokenizer pricing — fit once, apply as a broadcast lookup
    merges = bpe_learn(clean, "text", n_merges=8)
    wmap = bpe_vocab_map(clean, merges)
    words = clean.select(
        "source", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word")
    )
    tok_price = (
        words.join(F.broadcast(wmap), "word")
        .groupBy("source")
        .agg(
            F.sum("n_tokens").cast("long").alias("bpe_tokens"),
            F.round(F.sum("n_tokens") / F.count(F.lit(1)), 4).alias(
                "tokens_per_word"
            ),
        )
    )

    # 5. mixture net of near-duplicates
    pairs = ngram_jaccard_pairs(clean, n=3, threshold=0.2)
    kept = apply_dedup(clean, connected_components(pairs))
    mixture = source_mixture(
        kept, source_col="source", size_col=token_count_ws("text"), alpha=0.5
    )

    return {
        "triage": triage,
        "readability": readability,
        "buckets": buckets,
        "token_price": tok_price,
        "mixture": mixture,
    }


def main() -> int:
    from vectordb_migrator_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-planning", cpus=8)
    for name, df in plan_curation(spark, sf_dir).items():
        print(f"== {name} ==")
        df.show(10, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
