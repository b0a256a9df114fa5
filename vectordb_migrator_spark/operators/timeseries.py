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
