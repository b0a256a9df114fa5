"""Skew/co-location toolkit tests: salted join equivalence, bucketed
exchange-free joins."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.scale import salted_join, write_bucketed


@contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_salted_join_matches_plain_join(spark):
    # skewed left: one hot key with 500 rows
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 20)],
        ["k", "payload"],
    )
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(1, 20)], ["k", "tag"]
    )
    plain = {
        (r["k"], r["payload"], r["tag"])
        for r in left.join(right, "k").collect()
    }
    salted = {
        (r["k"], r["payload"], r["tag"])
        for r in salted_join(left, right, "k", salt=8).collect()
    }
    assert salted == plain
    assert len(salted) == 500 + 18


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (99, "no-match")], ["k", "v"])
    right = spark.createDataFrame([(1, "r1")], ["k", "tag"])
    rows = {
        (r["k"], r["tag"])
        for r in salted_join(left, right, "k", salt=4, how="left").collect()
    }
    assert rows == {(1, "r1"), (99, None)}


def test_bucketed_join_is_exchange_free(spark):
    """Two tables bucketed by the same key + count: the join plan has
    no Exchange (the shuffle was paid once at write time)."""
    a = spark.createDataFrame([(i, i * 10) for i in range(1000)], ["k", "va"])
    b = spark.createDataFrame([(i, i * 100) for i in range(1000)], ["k", "vb"])
    write_bucketed(a, "bkt_a", bucket_cols="k", num_buckets=8)
    write_bucketed(b, "bkt_b", bucket_cols="k", num_buckets=8)
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 1000


def test_write_partitioned_prunes_on_read(spark, tmp_path, documents):
    """A filter on the partition column must become a PartitionFilter
    (directory pruning) — NOT a data filter over all files."""
    from vectordb_migrator_spark.functions.text import lang_id
    from vectordb_migrator_spark.operators.scale import write_partitioned

    out = str(tmp_path / "by_lang")
    tagged = documents.withColumn("lang", lang_id("text"))
    write_partitioned(tagged, out, partition_cols="lang")

    back = spark.read.parquet(out).filter("lang = 'en'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    # the pruned read returns exactly the 'en' docs
    n_en = tagged.filter("lang = 'en'").count()
    assert back.count() == n_en > 0

    import os

    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert "lang=en" in dirs and len(dirs) >= 2


def test_fan_out_repartitions_packed_small_files(spark, tmp_path):
    """Many tiny files pack into 1-2 scan partitions
    (openCostInBytes/maxPartitionBytes) — a file COUNT above target
    must not short-circuit the width check; the physical probe still
    catches the packed scan and repartitions."""
    from vectordb_migrator_spark.operators.util import fan_out

    path = str(tmp_path / "tiny")
    spark.range(40).repartition(40).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= 8  # many tiny files...
    assert df.rdd.getNumPartitions() < 8  # ...packed into few splits
    out = fan_out(df, min_partitions=8)
    assert out.rdd.getNumPartitions() == 8


def test_fan_out_few_files_repartitions_without_physical_probe(spark, tmp_path):
    """The cheap common case: file count below target repartitions
    immediately (no second physical planning pass needed)."""
    from vectordb_migrator_spark.operators.util import fan_out

    path = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(path)
    out = fan_out(spark.read.parquet(path), min_partitions=4)
    assert out.rdd.getNumPartitions() == 4
