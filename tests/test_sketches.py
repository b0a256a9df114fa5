"""X7 sketch tests — accuracy and mergeability of the HLL rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vectordb_migrator_spark.suite import QUERIES


def test_hll_daily_merge_accuracy_and_mergeability(spark):
    """The union-merged daily sketches estimate the period's exact
    distinct-user count within HLL error (lgK=12 default → ~2% rsd;
    assert 5%), and event totals are exact."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = ev.select("user_id").distinct().count()
    n_events = ev.count()
    n_days = ev.select(F.to_date("ts")).distinct().count()

    row = QUERIES["x7_hll_daily_merge"](spark, SF_DIR).first()
    assert row["n_days"] == n_days
    assert row["n_events"] == n_events
    assert abs(row["distinct_users_est"] - exact) <= max(2, 0.05 * exact)

    # mergeability: the union of per-day sketches equals (same estimate
    # as) one global sketch over the raw data — the invariant that lets
    # a metrics store pre-aggregate once and roll up forever
    global_est = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"))
        .first()["e"]
    )
    assert row["distinct_users_est"] == int(global_est)
