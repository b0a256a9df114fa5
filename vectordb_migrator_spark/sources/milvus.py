"""Milvus adapter — schema-driven reader + columnar-batch writer.

Reference: ``adapters/milvus.py`` — schema introspection picks the PK,
the first FLOAT_VECTOR/BINARY_VECTOR field, and scalar metadata fields
(:70-95); ``collection.query(expr, output_fields, limit, offset)``
extracts (:96-130); the sink refuses DDL (:155-158), pivots rows to
columnar lists (:182-255), and reports detailed accounting (:266-291).

Spark rebuild:
- **read** — schema introspection on the driver, then executor
  partitions each ``query`` a PK range (``mapInPandas`` over range
  shards). Filter exprs (F3) pass through to ``expr`` verbatim.
- **write** — requires a pre-existing collection (reference refusal
  semantics); ``foreachPartition`` inserts Arrow-batch columns — the
  reference's row→column pivot (:182-255) is free here because Spark
  partitions are already columnar. Rows missing the PK are dropped
  with accounting (C4, :188-192); unknown metadata keys dropped,
  missing keys null-filled (C6, :224-233).

``pymilvus`` is optional — all touchpoints go through the injectable
``client_factory``; unit tests use fakes (reference strategy,
``tests/test_milvus_adapter.py``).
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
        from pymilvus import MilvusClient
    except ImportError as exc:  # pragma: no cover - optional dep
        raise ImportError(
            "pymilvus is required for a live Milvus connection; "
            "inject client_factory for testing"
        ) from exc
    uri = connection.get("uri") or (
        f"http://{connection.get('host', 'localhost')}:{connection.get('port', 19530)}"
    )
    return MilvusClient(uri=uri, token=connection.get("token", ""))


def plan_fields(schema_info: dict[str, Any]) -> tuple[str, str | None, list[str]]:
    """Pick (pk, vector_field, scalar_fields) from a collection schema —
    the reference's introspection logic (``adapters/milvus.py:70-95``):
    PK from ``is_primary``, vector = first FLOAT_VECTOR/BINARY_VECTOR,
    everything else scalar metadata. Vector may be absent (:90-93)."""
    pk = None
    vector_field = None
    scalars: list[str] = []
    for f_ in schema_info.get("fields", []):
        if f_.get("is_primary"):
            pk = f_["name"]
        elif f_.get("type") in ("FLOAT_VECTOR", "BINARY_VECTOR"):
            if vector_field is None:
                vector_field = f_["name"]
        else:
            scalars.append(f_["name"])
    if pk is None:
        raise ValueError("collection schema has no primary key")
    return pk, vector_field, scalars


_INT_TYPES = ("INT64", "INT32", "INT16", "INT8")
_FLOAT_TYPES = ("FLOAT", "DOUBLE")


def field_types(schema_info: dict[str, Any]) -> dict[str, str]:
    """name → declared Milvus type, for write-side value coercion."""
    return {
        f_["name"]: f_.get("type", "VARCHAR")
        for f_ in schema_info.get("fields", [])
    }


def coerce_to_field_type(val: Any, milvus_type: str) -> Any:
    """Coerce a canonical (stringified) value to the collection's
    declared scalar type before insert. The reference preserves source
    types end-to-end so an INT64-PK collection receives ints; the
    canonical pipeline stringifies, so without this back-coercion
    pymilvus rejects the rows (string PK into INT64). Mirrors the C2
    coercion the Qdrant writer applies to digit-string ids.

    A value that does not parse as the declared numeric type (e.g.
    metadata '3.5' or '' destined for INT64) null-fills instead of
    raising — a ValueError inside foreachPartition would fail the
    whole task AFTER partial inserts; null-fill is the same
    conform-to-schema (C6) behavior the reader applies."""
    if val is None:
        return None
    if milvus_type in _INT_TYPES:
        try:
            return int(val)
        except (ValueError, TypeError):
            return None
    if milvus_type in _FLOAT_TYPES:
        try:
            return float(val)
        except (ValueError, TypeError):
            return None
    if milvus_type == "BOOL":
        if isinstance(val, bool):
            return val
        return str(val).strip().lower() in ("true", "1", "t", "yes")
    return str(val)


class MilvusAdapter(SparkAdapter):
    name = "milvus"

    def __init__(self, client_factory: Callable[[dict[str, Any]], Any] | None = None):
        self.client_factory = client_factory or _require_client

    def read(
        self, spark: SparkSession, connection: dict[str, Any], query: dict[str, Any]
    ) -> DataFrame:
        collection = query.get("collection_name")
        if not collection:
            raise ValueError("milvus source requires 'collection_name'")
        factory = self.client_factory
        client = factory(connection)
        if not client.has_collection(collection):
            raise ValueError(f"collection {collection!r} does not exist")
        schema_info = client.describe_collection(collection)
        pk, vec_f, scalars = plan_fields(schema_info)
        output_fields = [pk] + ([vec_f] if vec_f else []) + scalars
        expr = query.get("filter_expr") or ""  # F3 passthrough
        if query.get("predicates"):
            # neutral predicates compile fully into the expr language —
            # the filter always runs server-side (sources/predicates.py)
            from vectordb_migrator_spark.sources.predicates import to_milvus_expr

            pk_is_int = any(
                f_.get("is_primary") and f_.get("type") in _INT_TYPES
                for f_ in schema_info.get("fields", [])
            )
            pexpr = to_milvus_expr(query["predicates"], pk=pk, pk_is_int=pk_is_int)
            expr = f"({expr}) and ({pexpr})" if expr else pexpr
        page = int(query.get("batch_size", 1_000))

        # Partition planning: each shard queries a disjoint PK residue
        # class (``pk % N == i``) so N executors scan in parallel with
        # NO overlap — the predicate is evaluated server-side, the
        # Milvus analogue of JDBC partitionColumn ranges. Requires an
        # integer PK; otherwise fall back to one cursor-looped shard.
        num_shards = int(query.get("num_partitions", 1))
        pk_type = next(
            (
                f_.get("type")
                for f_ in schema_info.get("fields", [])
                if f_.get("is_primary")
            ),
            None,
        )
        if num_shards > 1 and pk_type not in ("INT64", "INT32", "INT16", "INT8"):
            num_shards = 1
        shards = spark.createDataFrame(
            [(i, num_shards) for i in range(num_shards)], "shard int, of int"
        ).repartition(num_shards)

        def _shard_expr(shard: int, of: int) -> str:
            if of <= 1:
                return expr
            # non-negative residue: Milvus evaluates % with C semantics,
            # so a negative INT64 PK yields a negative remainder that
            # matches NO shard — plain `pk % N == i` silently loses
            # every negative-PK row when num_partitions > 1
            conj = f"((({pk} % {of}) + {of}) % {of}) == {shard}"
            return f"({expr}) and {conj}" if expr else conj

        def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cl = factory(connection)
            for pdf in batches:
                for row in pdf.itertuples():
                    sexpr = _shard_expr(int(row.shard), int(row.of))
                    recs = []
                    if hasattr(cl, "query_iterator"):
                        it = cl.query_iterator(
                            collection_name=collection,
                            filter=sexpr,
                            output_fields=output_fields,
                            batch_size=page,
                        )
                        while True:
                            batch = it.next()
                            if not batch:
                                it.close()
                                break
                            recs.extend(batch)
                    else:
                        recs = cl.query(
                            collection_name=collection,
                            filter=sexpr,
                            output_fields=output_fields,
                        )
                    out = [
                        {
                            "id": str(r[pk]),
                            "vector": (
                                [float(x) for x in r[vec_f]]
                                if vec_f and r.get(vec_f) is not None
                                else None
                            ),
                            # P3 — None-valued metadata keys omitted
                            # (adapters/milvus.py:120)
                            "metadata": {
                                k: str(r[k])
                                for k in scalars
                                if r.get(k) is not None
                            },
                        }
                        for r in recs
                    ]
                    if out:
                        yield pd.DataFrame(out)

        df = shards.mapInPandas(_scan, schema=CANONICAL_SCHEMA)
        return limit_offset(
            df,
            limit=query.get("limit"),
            offset=int(query.get("offset", 0)),
            order_by="id",
        )

    def write(
        self, df: DataFrame, connection: dict[str, Any], load: dict[str, Any]
    ) -> dict[str, Any]:
        collection = load.get("collection_name")
        if not collection:
            raise ValueError("milvus sink requires 'collection_name'")
        factory = self.client_factory
        client = factory(connection)
        # reference refuses to create collections (adapters/milvus.py:155-158)
        if not client.has_collection(collection):
            raise ValueError(
                f"collection {collection!r} must exist before loading (no DDL)"
            )
        schema_info = client.describe_collection(collection)
        pk, vec_f, scalars = plan_fields(schema_info)
        ftypes = field_types(schema_info)
        batch_size = int(load.get("batch_size", 1_000))

        # C4 — rows without a PK are skipped in-loop (reference inserts
        # only entities with a PK, adapters/milvus.py:266-291) but
        # STILL counted in total_rows, so `stats` means the same thing
        # across every sink: total input vs kept vs with-vector, and
        # the dropped-row count is observable as total - with_id.
        counters = make_write_counters(df)

        def _insert(rows: Iterator[Any]) -> None:
            cl = factory(connection)
            buf: list[dict[str, Any]] = []
            n = n_id = n_vec = 0

            def flush():
                if buf:
                    cl.insert(collection_name=collection, data=list(buf))
                    buf.clear()

            for row in rows:
                n += 1
                if row["id"] is None:
                    continue  # C4 — no PK, never inserted
                n_id += 1
                n_vec += row["vector"] is not None
                meta = dict(row["metadata"] or {})
                # id and scalars coerced to the collection's declared
                # types (reference preserves source types end-to-end;
                # an INT64-PK collection must receive ints, not the
                # canonical strings)
                rec: dict[str, Any] = {
                    pk: coerce_to_field_type(row["id"], ftypes.get(pk, "VARCHAR"))
                }
                if vec_f:
                    rec[vec_f] = list(row["vector"]) if row["vector"] else None
                # C6 — conform to schema: unknown keys dropped, missing
                # keys null-filled (adapters/milvus.py:224-233)
                for k in scalars:
                    rec[k] = coerce_to_field_type(
                        meta.get(k), ftypes.get(k, "VARCHAR")
                    )
                buf.append(rec)
                if len(buf) >= batch_size:
                    flush()
            flush()
            counters["total_rows"].add(n)
            counters["rows_with_id"].add(n_id)
            counters["rows_with_vector"].add(n_vec)

        df.foreachPartition(_insert)
        return {
            "collection": collection,
            "mode": "insert",
            "stats": {k: int(v.value) for k, v in counters.items()},
        }

    def get_schema_info(
        self, spark: SparkSession, connection: dict[str, Any], entity: str
    ) -> dict[str, Any]:
        """``Collection.schema`` fields/PK/auto_id
        (``adapters/milvus.py:329-358``)."""
        client = self.client_factory(connection)
        return client.describe_collection(entity)
