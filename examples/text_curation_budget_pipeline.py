"""Text-corpus curation with an explicit sampling budget — the
round-11 curation operators as one pipeline, the pass a data team runs
between "we crawled it" and "we train on it":

1. **Decontaminate** — GPT-3-style n-gram overlap against the held-out
   benchmark set; candidates whose trigram containment crosses the
   threshold are dropped BEFORE anything else sees them (leaked eval
   text inflates scores no matter how good the rest of the pipeline
   is). The benchmark shingle set broadcasts — at 100 TB it rides
   along like a dim table.
2. **Novelty filter** — per-document n-gram novelty (fraction of
   trigrams no earlier document contains); the low-novelty tail is
   re-crawled boilerplate and memorization pressure, not new text.
3. **Budget the sample** — temperature-scaled mixing over the language
   column (p ∝ n^(1/τ), τ-root 2) turns raw language counts into a
   sampling table that neither starves small languages (τ=1) nor
   drowns big ones (uniform); Hamilton apportionment makes the
   integer budgets sum EXACTLY.
4. **Draw it** — deterministic md5-rank sampling takes each language's
   allocated count from the surviving pool (same order on any engine,
   no RNG state to ship).

Every stage is a lazy DataFrame built from oracle-verified operators
(x0_decontamination, x5_ngram_novelty, x10_temperature_mixing);
nothing collects more than the language-sized allocation table.

Usage:
    python examples/text_curation_budget_pipeline.py [documents.parquet]
"""

from __future__ import annotations

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.dedup import (
    decontamination_report,
    ngram_novelty_report,
)
from vectordb_migrator_spark.operators.scale import temperature_mixing


def run_pipeline(
    spark,
    docs_path: str,
    *,
    budget: int = 200,
    contamination_threshold: float = 0.5,
    novelty_floor: float = 0.05,
) -> dict:
    docs = spark.read.parquet(docs_path)
    out: dict = {}

    # the benchmark: every 50th document stands in for the eval set
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    pool = docs.filter(F.col("doc_id") % 50 != 0)

    # 1. decontaminate
    decon = decontamination_report(
        pool, bench, n=3, threshold=contamination_threshold
    )
    clean_ids = decon.filter(~F.col("contaminated")).select("doc_id")
    out["n_contaminated"] = (
        decon.filter(F.col("contaminated")).count()
    )
    clean = pool.join(clean_ids, "doc_id", "left_semi")

    # 2. novelty floor (computed over the clean pool, id order)
    nov = ngram_novelty_report(clean, n=3)
    fresh_ids = nov.filter(
        F.col("novelty") >= F.lit(novelty_floor)
    ).select("doc_id")
    out["n_low_novelty"] = (
        nov.filter(F.col("novelty") < F.lit(novelty_floor)).count()
    )
    fresh = clean.join(fresh_ids, "doc_id", "left_semi")

    # 3. temperature-scaled language budgets (τ-root 2)
    mix = temperature_mixing(
        fresh, domain_col="lang", roots=(2,), budget=budget
    ).collect()
    alloc = {r["domain"]: int(r["alloc"]) for r in mix}
    out["alloc"] = alloc
    assert sum(alloc.values()) == budget

    # 4. deterministic md5-rank draw of each language's allocation
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(":draw:7"))),
            "doc_id",
        )
    )
    quota = F.array(
        *[
            F.struct(F.lit(k).alias("l"), F.lit(v).alias("q"))
            for k, v in sorted(alloc.items())
        ]
    )
    cap = F.element_at(F.map_from_entries(quota), F.col("lang"))
    sample = (
        fresh.withColumn("__rk", rk)
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )
    out["sample_count"] = sample.count()
    out["sample_by_lang"] = {
        r["lang"]: r["n"]
        for r in sample.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return out


if __name__ == "__main__":
    from vectordb_migrator_spark.session import get_spark

    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.001/documents.parquet"
    )
    spark = get_spark("text-curation-budget")
    result = run_pipeline(spark, path)
    for k, v in result.items():
        print(f"{k}: {v}")
