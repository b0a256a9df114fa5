"""Adapter registry — reference ``adapters/__init__.py:1-20``.

The reference maps type strings → adapter classes in ``ADAPTERS`` and
exposes ``list_adapters`` / ``get_adapter`` (case-insensitive, None on
unknown — asserted ``tests/test_adapters.py:19-49``). Same surface
here. DB-client-backed adapters import lazily so the package works
without optional drivers installed.
"""

from __future__ import annotations

from vectordb_migrator_spark.sources.base import SparkAdapter
from vectordb_migrator_spark.sources.parquet_io import (
    JsonlAdapter,
    ParquetAdapter,
)


def _pgvector():
    from vectordb_migrator_spark.sources.pgvector import PgVectorAdapter

    return PgVectorAdapter


def _qdrant():
    from vectordb_migrator_spark.sources.qdrant import QdrantAdapter

    return QdrantAdapter


def _milvus():
    from vectordb_migrator_spark.sources.milvus import MilvusAdapter

    return MilvusAdapter


def _pinecone():
    from vectordb_migrator_spark.sources.pinecone import PineconeAdapter

    return PineconeAdapter


#: type string → adapter class factory. Keys match the reference's
#: registry (pgvector/qdrant/milvus/pinecone, adapters/__init__.py:10-20)
#: plus the lakehouse formats the Spark rebuild adds.
_FACTORIES = {
    "parquet": lambda: ParquetAdapter,
    "jsonl": lambda: JsonlAdapter,
    "pgvector": _pgvector,
    "postgres": _pgvector,  # reference alias: pgvector IS postgres
    "qdrant": _qdrant,
    "milvus": _milvus,
    "pinecone": _pinecone,
}

ADAPTERS = dict(_FACTORIES)  # public view; values are factories


def list_adapters() -> list[str]:
    return sorted(_FACTORIES)


def get_adapter(name: str) -> type[SparkAdapter] | None:
    """Case-insensitive lookup; None on unknown (reference semantics)."""
    factory = _FACTORIES.get((name or "").lower())
    if factory is None:
        return None
    return factory()
