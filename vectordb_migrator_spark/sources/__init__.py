"""Source/sink adapters (the connector edges of the pipeline)."""

from vectordb_migrator_spark.sources.registry import (
    ADAPTERS,
    get_adapter,
    list_adapters,
)

__all__ = ["ADAPTERS", "get_adapter", "list_adapters"]
