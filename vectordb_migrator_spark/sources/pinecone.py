"""Pinecone adapter — the reference's *intended* (never shipped) edge.

Reference: ``adapters/pinecone.py`` is 0 bytes (SURVEY.md header note);
the intended surface is reconstructed from
``examples/pinecone_to_pgvector_config.json`` (source: ``index_name``,
``namespace``, ``batch_size``), ``examples/pgvector_to_pinecone_config.json``
(sink: ``create_index``, ``dimension``, ``metric``, ``namespace``), and
``tests/test_pinecone_adapter.py:38-42`` (client surface:
``Pinecone(api_key)``, ``list_indexes``).

Spark rebuild:
- **read** — executor partitions page ``index.list()`` id batches and
  ``fetch()`` them (``mapInPandas`` over id-prefix shards; Pinecone's
  list API supports a ``prefix`` argument, so shard by configured
  prefixes for parallel scans).
- **write** — driver-side index DDL when ``create_index``;
  ``foreachPartition`` upserts ``(id, values, metadata)`` tuples in
  ``batch_size`` chunks (idempotent by id → retry-safe).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from vectordb_migrator_spark.canonical import CANONICAL_SCHEMA
from vectordb_migrator_spark.operators.slicing import limit_offset
from vectordb_migrator_spark.sources.base import SparkAdapter, make_write_counters


def _require_client(connection: dict[str, Any]):
    try:
        from pinecone import Pinecone
    except ImportError as exc:  # pragma: no cover - optional dep
        raise ImportError(
            "pinecone client is required for a live connection; "
            "inject client_factory for testing"
        ) from exc
    return Pinecone(api_key=connection.get("api_key", ""))


class PineconeAdapter(SparkAdapter):
    name = "pinecone"

    def __init__(self, client_factory: Callable[[dict[str, Any]], Any] | None = None):
        self.client_factory = client_factory or _require_client

    def read(
        self, spark: SparkSession, connection: dict[str, Any], query: dict[str, Any]
    ) -> DataFrame:
        index_name = query.get("index_name")
        if not index_name:
            raise ValueError("pinecone source requires 'index_name'")
        namespace = query.get("namespace", "")
        batch = int(query.get("batch_size", 100))
        prefixes = query.get("id_prefixes") or [""]
        factory = self.client_factory

        shards = spark.createDataFrame(
            [(p,) for p in prefixes], "prefix string"
        ).repartition(len(prefixes))

        def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            client = factory(connection)
            index = client.Index(index_name)
            for pdf in batches:
                for row in pdf.itertuples():
                    for id_page in index.list(
                        prefix=row.prefix or None, namespace=namespace, limit=batch
                    ):
                        fetched = index.fetch(ids=list(id_page), namespace=namespace)
                        vectors = getattr(fetched, "vectors", None) or fetched["vectors"]
                        recs = [
                            {
                                "id": str(vid),
                                "vector": list(v["values"]) if v.get("values") else None,
                                "metadata": {
                                    str(k): str(x)
                                    for k, x in (v.get("metadata") or {}).items()
                                },
                            }
                            for vid, v in vectors.items()
                        ]
                        if recs:
                            yield pd.DataFrame(recs)

        df = shards.mapInPandas(_scan, schema=CANONICAL_SCHEMA)
        if query.get("predicates"):
            # the fetch-by-id read path has no server-side filter —
            # every neutral predicate evaluates post-scan
            from vectordb_migrator_spark.sources.predicates import apply_residual

            df = apply_residual(df, query["predicates"])
        return limit_offset(
            df,
            limit=query.get("limit"),
            offset=int(query.get("offset", 0)),
            order_by="id",
        )

    def write(
        self, df: DataFrame, connection: dict[str, Any], load: dict[str, Any]
    ) -> dict[str, Any]:
        index_name = load.get("index_name")
        if not index_name:
            raise ValueError("pinecone sink requires 'index_name'")
        namespace = load.get("namespace", "")
        batch_size = int(load.get("batch_size", 100))
        factory = self.client_factory

        client = factory(connection)
        if load.get("create_index"):
            existing = [getattr(i, "name", i) for i in client.list_indexes()]
            if index_name not in existing:
                client.create_index(
                    name=index_name,
                    dimension=int(load.get("dimension", 0)),
                    metric=load.get("metric", "cosine"),
                )

        counters = make_write_counters(df)

        def _upsert(rows: Iterator[Any]) -> None:
            cl = factory(connection)
            index = cl.Index(index_name)
            buf = []
            n = n_id = n_vec = 0

            def flush():
                if buf:
                    index.upsert(vectors=list(buf), namespace=namespace)
                    buf.clear()

            for row in rows:
                n += 1
                n_id += row["id"] is not None
                n_vec += row["vector"] is not None
                if row["id"] is None:
                    # C4 — str(None) would collapse every null-id row
                    # onto the literal point id "None"; skipped,
                    # observable as total_rows - rows_with_id
                    continue
                buf.append(
                    {
                        "id": str(row["id"]),
                        "values": list(row["vector"]) if row["vector"] else [],
                        "metadata": dict(row["metadata"] or {}),
                    }
                )
                if len(buf) >= batch_size:
                    flush()
            flush()
            counters["total_rows"].add(n)
            counters["rows_with_id"].add(n_id)
            counters["rows_with_vector"].add(n_vec)

        df.foreachPartition(_upsert)
        return {
            "index": index_name,
            "namespace": namespace,
            "mode": "upsert",
            "stats": {k: int(v.value) for k, v in counters.items()},
        }

    def get_schema_info(
        self, spark: SparkSession, connection: dict[str, Any], entity: str
    ) -> dict[str, Any]:
        client = self.client_factory(connection)
        index = client.Index(entity)
        stats = index.describe_index_stats()
        return {"index": entity, "stats": stats}
