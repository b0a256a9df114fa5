"""Structured Streaming — incremental migration (X8)."""

from vectordb_migrator_spark.streaming.incremental import (
    incremental_migration,
    windowed_event_counts,
)

__all__ = ["incremental_migration", "windowed_event_counts"]
