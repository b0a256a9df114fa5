"""Native DataFrame pipeline over the Python DataSource connectors.

The JSON-config ``Migrator`` mirrors the reference CLI; this example
is the idiomatic-Spark alternative: compose ``format("qdrant")`` /
``format("milvus")`` scans directly with DataFrame operators and let
Catalyst push the filters into the backends — then stream new records
into a collection with ``writeStream.format("qdrant")``.

Run against live servers by dropping the ``client_factory`` option
(it exists so tests / this container can use the file-backed fakes).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from vectordb_migrator_spark.sources.pyds import register_data_sources


def batch_copy(
    spark: SparkSession,
    *,
    source_opts: dict[str, str],
    target_opts: dict[str, str],
) -> None:
    """Qdrant → Milvus with a payload predicate that runs server-side.

    ``category == 'product'`` is a plain DataFrame filter; because the
    scan exposes payload keys as columns (``metadata_columns``) and
    implements ``pushFilters``, the predicate travels into the Qdrant
    scroll — only matching points cross the wire."""
    register_data_sources(spark)
    src = (
        spark.read.format("qdrant")
        .options(**source_opts)
        .option("metadata_columns", "category,name")
        .load()
        .filter(F.col("category") == "product")
    )
    canonical = src.select(
        "id",
        "vector",
        F.map_from_arrays(
            F.array(F.lit("category"), F.lit("name")),
            F.array("category", "name"),
        ).alias("metadata"),
    )
    (
        canonical.write.format("milvus")
        .mode("append")
        .options(**target_opts)
        .save()
    )


def incremental_stream(
    spark: SparkSession,
    *,
    input_path: str,
    checkpoint: str,
    target_opts: dict[str, str],
):
    """Parquet drop-folder → Qdrant, exactly-once-per-id.

    New files become microbatches; the sink upserts by id, so replays
    are idempotent — the reference's 'incremental migration' future
    work as ~10 lines."""
    from vectordb_migrator_spark.canonical import CANONICAL_SCHEMA

    register_data_sources(spark)
    return (
        spark.readStream.schema(CANONICAL_SCHEMA)
        .parquet(input_path)
        .writeStream.format("qdrant")
        .options(**target_opts)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_migration(
    spark: SparkSession,
    *,
    source_opts: dict[str, str],
    target_opts: dict[str, str],
    checkpoint: str,
):
    """Collection → collection as one lazy streaming pipeline.

    The source drains incrementally on a checkpointed scroll cursor
    (new points surface in later batches); the sink upserts by id, so
    the whole migration is exactly-once-per-id and restartable from
    the checkpoint — run it on a schedule with availableNow for
    incremental-batch migration, or leave it running continuously."""
    register_data_sources(spark)
    return (
        spark.readStream.format("qdrant")
        .options(**source_opts)
        .load()
        .writeStream.format("qdrant")
        .options(**target_opts)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
