"""T1 — the pluggable row-wise transform surface.

The reference loads a user module exposing ``transform(data) ->
data`` where ``data`` is the full list of canonical dicts, applied once
between extract and load (loader ``cli/migrate.py:66-93``; application
``core/migrator.py:79-87``; contract ``README.md:160-192``). The
transform may rename metadata fields, filter items out, modify vector
values, and add computed fields (``examples/add_source_tracking.py``).

Spark mapping: ``mapInPandas`` — the transform sees a *partition's*
rows (as canonical dicts, exactly the reference shape) and may return
fewer/more/modified rows. This is the closest distributed semantic:
the reference contract is per-item with list-level add/drop freedom,
and no published transform depends on cross-item state, so
partition-wise application is semantics-preserving while keeping the
data off the driver. Arrow batches both directions.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

from vectordb_migrator_spark.canonical import CANONICAL_SCHEMA

TransformFn = Callable[[list[dict[str, Any]]], list[dict[str, Any]]]


def load_transform_function(path: str) -> TransformFn | None:
    """Load ``transform`` from a user .py file by path.

    Mirrors ``cli/migrate.py:66-93``: uses importlib spec loading;
    a missing file or missing ``transform`` attribute degrades to
    ``None`` with a warning rather than aborting.
    """
    try:
        spec = importlib.util.spec_from_file_location("user_transform", path)
        if spec is None or spec.loader is None:
            raise ImportError(f"cannot load module from {path}")
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
    except Exception as exc:  # noqa: BLE001 — degrade like the reference
        print(f"warning: could not load transform module {path!r}: {exc}")
        return None
    fn = getattr(module, "transform", None)
    if not callable(fn):
        print(f"warning: module {path!r} has no callable 'transform'")
        return None
    return fn


def _rows_to_records(pdf: pd.DataFrame) -> list[dict[str, Any]]:
    records = []
    for row in pdf.itertuples(index=False):
        rec = row._asdict()
        vec = rec.get("vector")
        if vec is not None:
            rec["vector"] = list(vec)
        meta = rec.get("metadata")
        rec["metadata"] = dict(meta) if meta is not None else {}
        records.append(rec)
    return records


def _records_to_pdf(records: list[dict[str, Any]]) -> pd.DataFrame:
    if not records:
        return pd.DataFrame({"id": pd.Series(dtype="object"),
                             "vector": pd.Series(dtype="object"),
                             "metadata": pd.Series(dtype="object")})
    return pd.DataFrame(
        {
            "id": [None if r.get("id") is None else str(r.get("id")) for r in records],
            "vector": [r.get("vector") for r in records],
            "metadata": [
                None
                if r.get("metadata") is None
                else {str(k): (None if v is None else str(v)) for k, v in r["metadata"].items()}
                for r in records
            ],
        }
    )


def apply_transform(df: DataFrame, fn: TransformFn | None) -> DataFrame:
    """Apply a reference-contract transform to a canonical DataFrame.

    Existing user transform modules written for the reference port
    unchanged: they still receive a list of ``{"id", "vector",
    "metadata"}`` dicts and return the same. Exceptions propagate and
    fail the job (the reference aborts the migration on transform
    error, ``core/migrator.py:84-87``).
    """
    if fn is None:
        return df

    def _runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(_rows_to_records(pdf))
            if out is None:
                raise ValueError("transform returned None (must return a list)")
            yield _records_to_pdf(out)

    return df.mapInPandas(_runner, schema=CANONICAL_SCHEMA)


def add_source_tracking(
    source_db: str, timestamp: str | None = None
) -> TransformFn:
    """The reference's example transform, reference-contract style
    (``examples/add_source_tracking.py:12-47``): adds ``source_db`` and
    ``migration_timestamp`` to every item's metadata, creating the
    metadata dict if absent. ``timestamp`` is injectable for
    deterministic tests (the reference stamps ISO-now)."""
    from datetime import datetime, timezone

    stamp = timestamp or datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")

    def transform(data: list[dict[str, Any]]) -> list[dict[str, Any]]:
        for item in data:
            meta = item.get("metadata") or {}
            meta["source_db"] = source_db
            meta["migration_timestamp"] = stamp
            item["metadata"] = meta
        return data

    return transform
