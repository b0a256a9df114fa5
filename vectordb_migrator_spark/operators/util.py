"""Operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for CPU-heavy per-row work.

    The local testdata parquet has one row group per file, so scans
    come up single-partition and per-row compute (minhash signatures,
    simhash bit votes) would single-thread. On a real cluster the scan
    is already partition-parallel and this is a no-op, so the explicit
    exchange only exists where it pays for itself. Uses repartition
    with an explicit count — AQE does not coalesce user-specified
    partition numbers back down.

    Width is estimated from ``df.inputFiles()`` (a logical-plan walk)
    rather than ``df.rdd.getNumPartitions()``, which would force full
    physical planning of the plan-so-far on EVERY call — planning a
    100-operator DAG twice just to read a partition count. File count
    approximates scan width well for the case this guards (a tiny
    under-split scan feeding heavy compute); non-file sources (JDBC,
    connector ``mapInPandas`` scans) fall back to the physical-plan
    probe since they have no file listing.
    """
    sc = df.sparkSession.sparkContext
    # default: half the cores — measured sweet spot for the fan-out
    # case (a tiny under-partitioned scan feeding CPU-heavy per-row
    # work): enough parallelism to saturate compute, half the
    # per-task scheduling overhead of full-width
    target = min_partitions or max(2, sc.defaultParallelism // 2)
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — estimation only, never fatal
        n_files = 0
    if n_files:
        return df.repartition(target) if n_files < target else df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
