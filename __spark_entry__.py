"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke, sf0.001).
``queries()`` — every implemented operator as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL for the hash-compare gate.

Implementations live in ``vectordb_migrator_spark.suite``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vectordb_migrator_spark.suite import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: brute-force cosine top-k of a fixed probe against the
    embeddings corpus joined to per-label counts — exercises scan,
    vector math core, top-k, and a broadcast join, end to end."""
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.similarity import cosine_topk
    from vectordb_migrator_spark.suite import _probe_vector

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = _probe_vector(spark, sf_dir)
    topk = cosine_topk(emb, probe, k=20)
    labels = emb.select(F.col("vec_id"), F.col("label"))
    return topk.join(F.broadcast(labels), "vec_id").select(
        "vec_id", "score", F.col("label").cast("long").alias("label")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
