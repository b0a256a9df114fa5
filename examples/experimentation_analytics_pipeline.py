"""Experimentation analytics — the decision battery, end to end.

An A/B readout (or a release-to-release data comparison) is never one
number; it is a battery of complementary statistics, each catching a
failure mode the others miss:

    psi_drift          -> did the metric's DISTRIBUTION SHAPE move
                          (variance blowup, bimodality a mean hides)
    mann_whitney       -> nonparametric location shift (valid on
                          skewed / heavy-tailed metrics)
    ks_test            -> max ECDF gap (sensitive anywhere on the CDF)
    jackknife_ci       -> delete-one-bucket CI for the mean, unit-
                          cohort hashing respecting within-user
                          correlation (no resample rescans)
    cuped_adjust       -> variance reduction from a pre-period
                          covariate: same mean, tighter CI, readable
                          days earlier

All five fold the corpus to tiny frames first (distinct values, bin
counts, bucket aggregates, moment sums) — no statistic here ranks or
resamples raw rows, which is what makes the battery run at 100 TB.

Run: python examples/experimentation_analytics_pipeline.py <events_parquet>
"""

from __future__ import annotations

import sys


def run_battery(spark, events_path: str) -> dict:
    import pyspark.sql.functions as F

    from vectordb_migrator_spark.operators.scale import (
        cuped_adjust,
        jackknife_ci,
        ks_test,
        mann_whitney,
    )
    from vectordb_migrator_spark.operators.validation import psi_drift

    ev = (
        spark.read.parquet(events_path)
        # normalize TIMESTAMP_NTZ / nanos variants to session-zone
        # micros so the epoch arithmetic below is well-typed
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("user_id").isNotNull())
    )
    mid = ev.agg(
        (
            (F.min(F.col("ts").cast("double"))
             + F.max(F.col("ts").cast("double"))) / 2
        ).alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid)).withColumn(
        "side",
        F.when(F.col("ts").cast("double") <= F.col("mid"), "a")
        .otherwise("b"),
    )
    ref = tagged.filter(F.col("side") == "a")
    cur = tagged.filter(F.col("side") == "b")

    out: dict = {}
    out["psi"] = psi_drift(ref, cur, "value").first().asDict()
    out["mannwhitney"] = (
        mann_whitney(tagged, "value", side_col="side", side_a="a")
        .first()
        .asDict()
    )
    out["ks"] = (
        ks_test(tagged, "value", side_col="side", side_a="a")
        .first()
        .asDict()
    )
    out["jackknife"] = (
        jackknife_ci(cur, "value", unit_col="user_id", buckets=32)
        .first()
        .asDict()
    )

    is_pre = F.col("side") == "a"
    per = tagged.groupBy("user_id").agg(
        F.sum(F.when(is_pre, F.col("value")).cast("decimal(28,6)")).alias("ps"),
        F.sum(is_pre.cast("long")).alias("pn"),
        F.sum(F.when(~is_pre, F.col("value")).cast("decimal(28,6)")).alias("qs"),
        F.sum((~is_pre).cast("long")).alias("qn"),
    )
    units = per.filter((F.col("pn") > 0) & (F.col("qn") > 0)).select(
        F.round(F.col("ps").cast("double") / F.col("pn"), 6).alias("x"),
        F.round(F.col("qs").cast("double") / F.col("qn"), 6).alias("y"),
    )
    out["cuped"] = (
        cuped_adjust(units, metric_col="y", covariate_col="x")
        .first()
        .asDict()
    )
    return out


if __name__ == "__main__":
    from vectordb_migrator_spark.session import get_spark

    spark = get_spark("experimentation-analytics", cpus=8)
    result = run_battery(
        spark, sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.001/events.parquet"
    )
    for name, row in result.items():
        print(name, row)
