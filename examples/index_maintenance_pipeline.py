"""ANN index operations — the maintenance lifecycle, end to end.

A production vector index is not one build; it is a loop:

    build_ivf_index          -> hive layout: corpus partitioned by
                                coarse cluster + tiny centroid table
    ivf_index_batch_topk     -> serve a probe BATCH from ONE pruned scan
    ivf_index_append         -> O(batch) ingest against frozen centroids
    ivf_index_health         -> footer-count imbalance check (cheap)
    ivf_index_refit          -> gated Lloyd rebuild + rename-swap publish
                                (crash window healed by ivf_finish_swap
                                on the next touch)

plus the layout-tuning gauges a refit decision reads:
`opq_balanced_permutation` (subspace balance) and the nprobe/recall
sweep in the suite.

Run: python examples/index_maintenance_pipeline.py <embeddings_parquet> <work_dir>
"""

from __future__ import annotations

import sys


def run_lifecycle(spark, emb_path: str, work: str) -> dict:
    import pyspark.sql.functions as F

    from vectordb_migrator_spark.operators.clustering import kmeans_fit
    from vectordb_migrator_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_index_batch_topk,
        ivf_index_health,
        ivf_index_refit,
    )

    emb = spark.read.parquet(emb_path)
    path = f"{work}/ivf"

    # 1. initial build: k-means coarse quantizer -> hive layout
    assigned, _, _ = kmeans_fit(emb, k=4, max_iter=5)
    build_ivf_index(assigned, path, cluster_col="cluster")

    # 2. serve a probe batch from ONE scan of the probed-partition union
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    )
    hits = ivf_index_batch_topk(
        spark, path, probes, cluster_col="cluster", k=5, nprobe=2
    ).count()

    # 3. O(batch) ingest: new rows assigned to the FROZEN centroids
    newbie = emb.limit(10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    ivf_index_append(spark, path, newbie, cluster_col="cluster")

    # 4. cheap health check gates the expensive refit
    health = ivf_index_health(spark, path).collect()
    imbalance = health[0]["imbalance"]
    refit_ran = ivf_index_refit(spark, path, k=4, max_imbalance=1.05)

    return {
        "batch_hits": hits,
        "partitions": len(health),
        "imbalance": imbalance,
        "refit_ran": refit_ran,
        "rows": spark.read.parquet(f"{path}/corpus").count(),
    }


def main() -> int:
    from vectordb_migrator_spark.session import get_spark

    emb_path, work = sys.argv[1], sys.argv[2]
    spark = get_spark("index-maintenance", cpus=8)
    print(run_lifecycle(spark, emb_path, work))
    return 0


if __name__ == "__main__":
    sys.exit(main())
