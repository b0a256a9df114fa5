"""Streaming incremental migration tests (X8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_migrator_spark.streaming.incremental import (
    incremental_migration,
    windowed_event_counts,
)


@pytest.fixture()
def canon_source(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(str(i), [float(i), 0.0], {"n": str(i)}) for i in range(30)],
        "id string, vector array<float>, metadata map<string,string>",
    )
    df.write.parquet(src)
    return src


def test_incremental_migration_foreachbatch(spark, tmp_path, canon_source):
    out = str(tmp_path / "out")

    def upsert(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = incremental_migration(
        spark,
        source_path=canon_source,
        source_schema="id string, vector array<float>, metadata map<string,string>",
        upsert=upsert,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 30

    # restart with same checkpoint: no new data → no duplicates
    q2 = incremental_migration(
        spark,
        source_path=canon_source,
        source_schema="id string, vector array<float>, metadata map<string,string>",
        upsert=upsert,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 30


def test_incremental_with_transform(spark, tmp_path, canon_source):
    out = str(tmp_path / "out2")

    def transform(data):
        for d in data:
            d["metadata"]["seen"] = "1"
        return data

    def upsert(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = incremental_migration(
        spark,
        source_path=canon_source,
        source_schema="id string, vector array<float>, metadata map<string,string>",
        upsert=upsert,
        transform=transform,
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert all(r["metadata"]["seen"] == "1" for r in rows)


def test_windowed_counts_batch_equivalence(spark):
    """The windowed agg runs identically on batch input (Spark's
    unified model) — verify window math on a known dataset."""
    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a", 1.0), ("2024-01-01 00:50:00", "a", 2.0),
         ("2024-01-01 01:10:00", "b", 3.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r["window_start"].isoformat(), r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(df).collect()
    }
    assert out == {
        ("2024-01-01T00:00:00", "a"): (2, 3.0),
        ("2024-01-01T01:00:00", "b"): (1, 3.0),
    }
