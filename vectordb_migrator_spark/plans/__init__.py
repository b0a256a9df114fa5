"""Pipeline planning — config JSON → lazy DataFrame DAG."""

from vectordb_migrator_spark.plans.pipeline import Migrator, run_migration

__all__ = ["Migrator", "run_migration"]
