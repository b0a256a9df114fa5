"""Metric release gate with drift alarms — the round-10 statistical
operators as one pipeline, the pass a team runs before promoting a new
data or model snapshot when the only trustworthy inputs are its daily
metric streams:

1. **Drift alarms** — two-sided CUSUM control charts per event type
   catch small persistent level shifts a per-day threshold misses,
   and report the first alarm day.
2. **Distribution shift** — the Mann–Whitney U rank-sum test compares
   the candidate window's values against the baseline window per
   event type, distribution-free (heavy tails don't fool it the way
   they fool a t-test).
3. **Guarantee layer** — split conformal prediction intervals wrap
   the per-type point predictor with a distribution-free coverage
   certificate; groups too small for a finite guarantee surface as
   NULL q-hat rather than silently vanishing.
4. **Verdict** — a type ships only if it has no CUSUM alarm, no
   significant rank shift, and a finite conformal interval.

Every stage is a lazy DataFrame; all three operators are
oracle-verified in the suite (x13_cusum_changepoint, x7_mann_whitney,
x7_conformal_interval). Nothing collects more than report-sized
frames.

Usage:
    python examples/release_gate_pipeline.py [events.parquet]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.scale import (
    mann_whitney_report,
    split_conformal_report,
)
from vectordb_migrator_spark.operators.timeseries import cusum_changepoint


def run_pipeline(spark, events_path: str) -> dict:
    events = spark.read.parquet(events_path).filter(
        F.col("value").isNotNull()
    )
    out: dict = {}

    # 1. CUSUM drift alarms on the daily rollup
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    alarms = {
        r["event_type"]: r
        for r in cusum_changepoint(
            daily, "v", time_col="day", group_cols=["event_type"]
        ).collect()
    }
    out["alarms"] = alarms

    # 2. rank shift: last-30-day candidate window vs everything before
    cutoff = events.agg(
        F.date_sub(F.max(F.to_date("ts")), 30).alias("c")
    ).first()["c"]
    shift = {
        r["event_type"]: r
        for r in mann_whitney_report(
            events,
            "value",
            group_cols=["event_type"],
            split_expr=F.to_date("ts") > F.lit(cutoff),
        ).collect()
    }
    out["shift"] = shift

    # 3. conformal coverage certificate per type
    conf = {
        r["event_type"]: r
        for r in split_conformal_report(
            events, "value", unit_col="user_id",
            group_cols=["event_type"],
        ).collect()
    }
    out["conformal"] = conf

    # 4. the gate verdict
    verdict = {}
    for et in sorted(alarms):
        a, s, c = alarms.get(et), shift.get(et), conf.get(et)
        verdict[et] = {
            "drift_alarm": bool(a and a["alarmed"]),
            "rank_shift": bool(s and s["significant"]),
            "finite_interval": bool(c and c["qhat"] is not None),
        }
        verdict[et]["ship"] = (
            not verdict[et]["drift_alarm"]
            and not verdict[et]["rank_shift"]
            and verdict[et]["finite_interval"]
        )
    out["verdict"] = verdict
    return out


if __name__ == "__main__":
    from vectordb_migrator_spark.session import get_spark

    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.001/events.parquet"
    )
    spark = get_spark("release-gate-example", cpus=8)
    result = run_pipeline(spark, path)
    for et, v in result["verdict"].items():
        print(et, v)
