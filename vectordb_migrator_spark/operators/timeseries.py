"""Time-series regularization: resample an event stream onto a dense
per-key hourly grid, filling silent hours with zeros.

Dashboards/feature pipelines need "no data" to be an explicit 0, not a
missing row. Shape: one tiny bounds aggregate (2 timestamps) →
``sequence()`` expands the hour axis driver-free → cross join with the
distinct key set (both sides tiny → broadcast) → left join the real
hourly aggregate. The only full-data pass is the hourly groupBy; the
grid construction is O(hours × keys), independent of event volume —
at 100 TB of events the grid is still a few thousand rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_fill_hourly(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Dense (hour × key) grid with event counts, zero-filled.

    Returns columns: ``hour`` (timestamp, truncated), ``key_col``,
    ``n`` (long, 0 where the source had no events).
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        df.select(hour.alias("hour"), F.col(key_col))
        .groupBy("hour", key_col)
        .agg(F.count("*").alias("n"))
    )
    bounds = df.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("mn"),
        F.date_trunc("hour", F.max(ts_col)).alias("mx"),
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hour")
    )
    keys = df.select(key_col).distinct()
    grid = hours.crossJoin(F.broadcast(keys))
    return (
        grid.join(hourly, ["hour", key_col], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)).cast("long"))
    )


def zscore_anomalies(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key z-score outliers: flag rows whose value sits more than
    ``threshold`` sample standard deviations from their key's mean.

    Two-pass shape on purpose: a map-side-combinable
    ``groupBy(key).agg(avg, stddev)`` produces a key-cardinality-sized
    stats table that broadcasts back into the scan. The tempting
    single-pass alternative — an unbounded ``Window.partitionBy(key)``
    — funnels every row of a key through one task, which is exactly the
    skew that kills low-cardinality keys at 100 TB; two cheap scans
    with a broadcast join beat one skewed exchange.

    z is rounded before thresholding so the kept set is stable across
    engines computing the aggregates in different summation orders.
    """
    mu, sd = f"__mu_{value_col}", f"__sd_{value_col}"
    stats = df.groupBy(key_col).agg(
        F.avg(value_col).alias(mu), F.stddev_samp(value_col).alias(sd)
    )
    z = F.round((F.col(value_col) - F.col(mu)) / F.col(sd), 6)
    return (
        df.join(F.broadcast(stats), key_col)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= threshold)
        .drop(mu, sd)
    )
