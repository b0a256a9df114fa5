"""The oracle-checked query suite — one entry per implemented operator.

Each ``QUERIES[name]`` is a ``(spark, sf_dir) -> DataFrame`` callable;
``ORACLES[name]`` (when present) is the exactly-equivalent ANSI SQL that
DuckDB runs over the same parquet files. The driver hash-compares the
two at sf0.01, so every computed column is aliased identically on both
sides, every integer is cast to BIGINT, every float is rounded, and
every fold/regex is formulated identically.

Output-type conventions (to survive the driver's schema + value-hash
compare): ints → long, floats → rounded double, timestamps → formatted
string. Sums over doubles are cast to DECIMAL pre-aggregation so the
result is associativity-independent (Spark and DuckDB may reduce in
different orders; decimal addition is exact) — but every OUTPUT column
is final-cast to DOUBLE on both sides: the driver canonicalizes through
pandas, where DuckDB decimals arrive as float64 while Spark decimals
stay Python Decimal, so ``Decimal('138014.00') != 138014.0`` whenever a
value has trailing zeros. Never emit DECIMAL (or a bare array — pandas
can't sort lists) in a query's final schema.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql.types import LongType

from vectordb_migrator_spark.canonical import (
    coerce_id,
    format_pgvector_text,
    parse_pgvector_text,
    to_canonical_columns,
)
from vectordb_migrator_spark.functions.text import (
    LANG_PRIORITY,
    LANG_STOPWORDS,
    lang_id,
    md5_fingerprint,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    stopword_ratio,
    token_count_bpe,
    token_count_ws,
)
from vectordb_migrator_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_text_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from vectordb_migrator_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    fake_decoder,
)
from vectordb_migrator_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    knn_join,
    lsh_bucket_topk,
    pq_adc_topk,
    pq_sampled_codebooks,
)
from vectordb_migrator_spark.operators.relational import asof_join, session_stats
from vectordb_migrator_spark.operators.transform import apply_transform
from vectordb_migrator_spark.plans.pipeline import Migrator

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # ts representation varies by generator version: TIMESTAMP(NANOS)
        # (which Spark's vectorized reader only accepts as long) vs plain
        # TIMESTAMP. Normalize both to session-zone micros — under the
        # UTC session this is exactly DuckDB's value.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            # a duplicate registration SILENTLY shadows the earlier
            # query (import order wins) — round 11 briefly lost the
            # round-7 x12_benford this way; fail loudly instead
            raise ValueError(
                f"query {name!r} is already registered "
                f"({QUERIES[name].__module__}); pick a new name"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _probe_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """Probe = the embedding of a fixed row. One single-row pruned scan;
    this is a query *parameter*, not data movement."""
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


_PROBE_SQL = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"

# deterministic LSH hyperplanes (seeded — NOT runtime randomness);
# the second independent set is the multi-set recall knob's input
_PLANES = np.random.default_rng(42).standard_normal((6, 64)).round(6).tolist()
_PLANES2 = np.random.default_rng(43).standard_normal((6, 64)).round(6).tolist()


