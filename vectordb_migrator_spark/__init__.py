"""vectordb_migrator_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference project
``BenHaimItay/vectordb-migrator`` (a single-process vector-DB migration
tool; see ``/root/reference``, surveyed in ``SURVEY.md``), re-expressed
as a distributed, lazy, Catalyst-optimized Spark DataFrame pipeline,
plus the LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis) required for 100 TB-scale use.

Public API (mirrors the reference's ``vectordb_migration.__init__``
exports — reference ``vectordb_migration/__init__.py:16-39`` — but every
entry point operates on Spark DataFrames, never driver-side lists):

- ``run_migration(spark, config, transform=None)`` — config-driven
  pipeline (reference ``cli/migrate.py:96``).
- ``Migrator`` — the orchestrator class (reference
  ``core/migrator.py:20``).
- ``ADAPTERS`` / ``list_adapters`` / ``get_adapter`` — source/sink
  registry (reference ``adapters/__init__.py``).
- ``canonical`` — the canonical record schema helpers (reference
  ``core/adapter.py:33-55``).
"""

from vectordb_migrator_spark.canonical import (
    CANONICAL_SCHEMA,
    normalize,
    to_canonical_columns,
)
from vectordb_migrator_spark.plans.pipeline import (
    Migrator,
    StreamMigrator,
    run_migration,
    run_stream_migration,
)
from vectordb_migrator_spark.sources.registry import (
    ADAPTERS,
    get_adapter,
    list_adapters,
)

__version__ = "0.1.0"

__all__ = [
    "ADAPTERS",
    "CANONICAL_SCHEMA",
    "Migrator",
    "StreamMigrator",
    "__version__",
    "get_adapter",
    "list_adapters",
    "normalize",
    "run_migration",
    "run_stream_migration",
    "to_canonical_columns",
]
