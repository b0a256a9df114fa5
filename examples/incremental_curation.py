"""Continuous training-data curation — the streaming composition.

Documents ARRIVE (a landing directory, at scale a Kafka topic or
object-store notification feed); the pipeline maintains a curated
corpus incrementally, never rescanning history:

    inbox  --validated_ingest-->  clean/       (per-batch quality gate,
                                                bad batches quarantined
                                                with their report)
    clean  --deduped_ingest--->   corpus/      (near-dup filtered against
                                                the persisted shingle
                                                store; store compacts
                                                itself every N batches)
    clean  --mixture_ingest--->   counts/      (per-source statistics)
    clean  --curation_ingest-->   grain/       (curation-report grain:
                                                counts + HLL dup
                                                sketches per batch)

and at any point the BATCH layer derives training artifacts from the
maintained stores:

    mixture_over(counts)          -> the current temperature-mixing plan
    curation_report_over(grain)   -> the full curation report (mixtures,
                                     language shares, length histogram,
                                     dup/quality rates, totals)
    export_shards(corpus)         -> deterministic shard layout + manifest

Every stage is replay-idempotent (batch-keyed writes / id anti-joins),
so a crashed run resumes from its checkpoint without duplicates.

Run: python examples/incremental_curation.py <inbox_dir> <work_dir>
"""

from __future__ import annotations

import sys


SCHEMA = "doc_id long, text string, source string"


def run_cycle(spark, inbox: str, work: str) -> dict:
    """One catch-up cycle (availableNow): gate, dedup, count — then
    derive the current mixture plan and shard manifest."""
    from vectordb_migrator_spark.operators.scale import export_shards
    from vectordb_migrator_spark.streaming.incremental import (
        curation_ingest,
        curation_report_over,
        deduped_ingest,
        mixture_ingest,
        mixture_over,
        validated_ingest,
    )

    q = validated_ingest(
        spark,
        source_path=inbox,
        source_schema=SCHEMA,
        corpus_path=f"{work}/clean",
        quarantine_path=f"{work}/quarantine",
        checkpoint=f"{work}/ckpt/gate",
        validate={"min_rows": 1, "not_null": ["doc_id", "text"]},
    )
    q.awaitTermination(300)

    q = deduped_ingest(
        spark,
        source_path=f"{work}/clean",
        source_schema=SCHEMA,
        corpus_path=f"{work}/corpus",
        checkpoint=f"{work}/ckpt/dedup",
        n=3,
        threshold=0.5,
        compact_every=4,
    )
    q.awaitTermination(300)

    q = mixture_ingest(
        spark,
        source_path=f"{work}/clean",
        source_schema=SCHEMA,
        counts_path=f"{work}/counts",
        checkpoint=f"{work}/ckpt/mixture",
    )
    q.awaitTermination(300)

    q = curation_ingest(
        spark,
        source_path=f"{work}/clean",
        source_schema=SCHEMA,
        grain_path=f"{work}/grain",
        checkpoint=f"{work}/ckpt/report",
    )
    q.awaitTermination(300)

    mixture = mixture_over(spark, f"{work}/counts", alpha=0.5, budget=1000)
    report = curation_report_over(spark, f"{work}/grain")
    manifest = export_shards(
        spark.read.parquet(f"{work}/corpus"),
        f"{work}/shards",
        id_col="doc_id",
        n_shards=4,
    )
    return {
        "corpus_rows": spark.read.parquet(f"{work}/corpus").count(),
        "mixture": {r["source"]: r["epochs"] for r in mixture.collect()},
        "report": {
            (r["section"], r["k"]): r["v"] for r in report.collect()
        },
        "shards": {r["shard"]: r["n_rows"] for r in manifest.collect()},
    }


def main() -> int:
    from vectordb_migrator_spark.session import get_spark

    inbox, work = sys.argv[1], sys.argv[2]
    spark = get_spark("incremental-curation", cpus=8)
    print(run_cycle(spark, inbox, work))
    return 0


if __name__ == "__main__":
    sys.exit(main())
