"""Graph-aware dedup triage — the round-8 composition, end to end.

Near-dup candidate pairs are where dedup STARTS, not where it ends.
This pipeline layers the round-8 graph and shift-robust operators on
one shared candidate frame to answer the three questions a curation
owner actually asks:

    cdc_pair_candidates  -> which duplicates did fixed shingling MISS
                            (insert-shifted copies: chunk equality
                            survives a prepended paragraph)
    label_propagation    -> the dup families' DENSE CORES (connected
                            components over-merge weakly-bridged
                            families; LPA splits them)
    pagerank(seeds=...)  -> given a known-bad seed list, which other
                            documents the graph vouches are tied to
                            it (the contamination expansion queue)
    adamic_adar          -> which UNLINKED pairs the neighborhood
                            structure says are dups anyway (the
                            threshold-lowering review queue). An
                            EMPTY queue is itself the finding: the
                            threshold graph is transitively closed,
                            so lowering the threshold buys nothing —
                            on co-occurrence graphs (carts, sessions)
                            use graph.co_occurrence_edges, where open
                            wedges are the norm

Every stage shares the same scale posture: the pair frame is the
bounded gram-bucket join (star-capped), the CDC chunker is one linear
codegen fold, and the graph loops shuffle (long, long) ids only.

Run: python examples/graph_dedup_pipeline.py <documents_parquet>
"""

from __future__ import annotations

import sys


def run_pipeline(spark, documents_path: str) -> dict:
    import pyspark.sql.functions as F

    from vectordb_migrator_spark.operators.dedup import (
        cdc_chunks,
        cdc_pair_candidates,
        ngram_jaccard_pairs,
    )
    from vectordb_migrator_spark.operators.graph import (
        adamic_adar,
        label_propagation,
        pagerank,
    )

    docs = spark.read.parquet(documents_path)

    # one shared similarity-pair frame; materialized once, every
    # downstream consumer reads the checkpoint
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2).localCheckpoint(
        eager=True
    )

    out: dict = {}

    # 1. shift-robust candidates the shingle threshold cannot see
    chunks = cdc_chunks(docs, avg_tokens=8)
    cdc = cdc_pair_candidates(chunks, min_shared=2)
    known = pairs.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    novel = (
        cdc.withColumnRenamed("id_a", "a")
        .withColumnRenamed("id_b", "b")
        .join(known, ["a", "b"], "left_anti")
    )
    out["cdc_novel_pairs"] = novel.count()

    # 2. dense cores: communities, not just reachability
    communities = label_propagation(pairs, n_iter=3)
    out["communities"] = communities.select("label").distinct().count()

    # 3. contamination expansion from a seed list (here: the 5
    #    smallest ids, standing in for a curated known-bad list)
    verts = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    seeds = [r["id"] for r in verts.orderBy("id").limit(5).collect()]
    ppr = pagerank(pairs, seeds=seeds)
    out["expansion_queue"] = (
        ppr.filter(~F.col("id").isin(seeds))
        .orderBy(F.desc("rank"), "id")
        .limit(10)
        .collect()
    )

    # 4. pairs the structure vouches for below the threshold
    out["review_queue"] = adamic_adar(pairs, k=10).collect()
    return out


if __name__ == "__main__":
    from vectordb_migrator_spark.session import get_spark

    path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/testdata/sf0.01/documents.parquet"
    )
    spark = get_spark("graph-dedup-example", cpus=8)
    res = run_pipeline(spark, path)
    print(f"novel shift-robust pairs: {res['cdc_novel_pairs']}")
    print(f"communities: {res['communities']}")
    print(f"expansion queue: {len(res['expansion_queue'])} docs")
    print(f"AA review queue: {len(res['review_queue'])} pairs")
