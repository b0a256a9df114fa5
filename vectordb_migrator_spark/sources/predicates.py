"""Neutral predicate set + per-backend filter translation.

SURVEY §4 ("custom Spark work required" #1): the reference passes
backend filter DSLs through verbatim (``adapters/qdrant.py:84,105``,
``adapters/milvus.py:96``), so composing a connector read with a
predicate evaluates it post-scan. This module closes that gap with a
small neutral predicate form that ``read()`` translates INTO the
backend's own DSL — the filter runs server-side, and only the corpus
subset crosses the wire. Anything a backend can't express stays a
residual predicate applied to the canonical DataFrame post-scan, so
semantics never silently change.

Neutral form (config key ``predicates``)::

    {"col": "category", "op": "eq",  "value": "news"}
    {"col": "id",       "op": "in",  "value": [1, 2, 3]}
    {"col": "price",    "op": "gte", "value": 10.5}

``col == "id"`` targets the canonical id (Qdrant point id / Milvus
PK); any other col is a metadata/payload key. Ops: eq, ne, in, gt,
gte, lt, lte.

Translation coverage:

- **Qdrant** — metadata eq/in → ``match``/``match any``, ne →
  ``must_not match``, numeric ranges → ``range``; id eq/in →
  ``has_id``. Id ranges and non-numeric ranges are residual (Qdrant
  has no id-range or lexicographic-range condition).
- **Milvus** — every op compiles to a boolean ``expr`` conjunct
  (``pk in [..] and price >= 10.5``); nothing is residual.
- **Pinecone** — the fetch-by-id read path has no server-side filter,
  so every predicate is residual.

Residual evaluation uses Spark's three-valued logic: a row whose
metadata key is missing fails every residual predicate (matches
Milvus ``!=`` -on-null semantics; Qdrant ``must_not`` on a missing
key would pass, which is why ne stays translated there).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPS = {"eq", "ne", "in", "gt", "gte", "lt", "lte"}
RANGE_OPS = {"gt", "gte", "lt", "lte"}


def validate(preds: list[dict[str, Any]]) -> list[dict[str, Any]]:
    for p in preds:
        if not isinstance(p, dict) or "col" not in p or "op" not in p:
            raise ValueError(f"predicate needs col/op/value: {p!r}")
        if p["op"] not in OPS:
            raise ValueError(f"unknown predicate op {p['op']!r} (have {sorted(OPS)})")
        if "value" not in p:
            raise ValueError(f"predicate needs a value: {p!r}")
        if p["op"] == "in" and not isinstance(p["value"], (list, tuple)):
            raise ValueError(f"'in' predicate value must be a list: {p!r}")
    return list(preds)


def _is_num(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


# ---------------------------------------------------------------------
# Qdrant
# ---------------------------------------------------------------------

_QDRANT_RANGE = {"gt": "gt", "gte": "gte", "lt": "lt", "lte": "lte"}


def split_for_qdrant(
    preds: list[dict[str, Any]],
) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """(translatable, residual) for the Qdrant filter DSL."""
    ok, resid = [], []
    for p in validate(preds):
        if p["col"] == "id":
            (ok if p["op"] in ("eq", "in") else resid).append(p)
        elif p["op"] in RANGE_OPS and not _is_num(p["value"]):
            resid.append(p)  # lexicographic range: no Qdrant condition
        else:
            ok.append(p)
    return ok, resid


def to_qdrant_filter(preds: list[dict[str, Any]]) -> dict[str, Any] | None:
    """Compile translatable predicates to Qdrant's must/must_not DSL
    (dict form — what ``scroll(scroll_filter=…)`` accepts)."""
    must: list[dict[str, Any]] = []
    must_not: list[dict[str, Any]] = []
    for p in preds:
        col, op, v = p["col"], p["op"], p["value"]
        if col == "id":
            must.append({"has_id": list(v) if op == "in" else [v]})
        elif op == "eq":
            must.append({"key": col, "match": {"value": v}})
        elif op == "ne":
            must_not.append({"key": col, "match": {"value": v}})
        elif op == "in":
            must.append({"key": col, "match": {"any": list(v)}})
        else:  # numeric range (split_for_qdrant guarantees)
            must.append({"key": col, "range": {_QDRANT_RANGE[op]: v}})
    if not must and not must_not:
        return None
    out: dict[str, Any] = {}
    if must:
        out["must"] = must
    if must_not:
        out["must_not"] = must_not
    return out


def merge_qdrant_filters(
    base: dict[str, Any] | None, extra: dict[str, Any] | None
) -> dict[str, Any] | None:
    """Conjoin a user-supplied DSL filter with translated predicates
    (append to must/must_not; never mutate the caller's dict)."""
    if not extra:
        return base
    if not base:
        return extra
    out = {k: list(v) if isinstance(v, list) else v for k, v in base.items()}
    for key in ("must", "must_not"):
        if extra.get(key):
            out[key] = list(out.get(key, [])) + list(extra[key])
    return out


# ---------------------------------------------------------------------
# Milvus
# ---------------------------------------------------------------------

_MILVUS_OP = {"eq": "==", "ne": "!=", "gt": ">", "gte": ">=", "lt": "<", "lte": "<="}


def _milvus_val(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if _is_num(v):
        return repr(v)
    s = str(v).replace("\\", "\\\\").replace('"', '\\"')
    return f'"{s}"'


def to_milvus_expr(
    preds: list[dict[str, Any]], *, pk: str, pk_is_int: bool
) -> str:
    """Compile ALL neutral predicates to one Milvus boolean expr
    conjunction — Milvus' expr language covers the whole op set, so
    nothing is residual. ``id`` maps to the collection PK, with values
    coerced to the PK's declared type."""
    parts = []
    for p in validate(preds):
        col, op, v = p["col"], p["op"], p["value"]
        if col == "id":
            col = pk
            coerce = (lambda x: int(x)) if pk_is_int else (lambda x: str(x))
            v = [coerce(x) for x in v] if op == "in" else coerce(v)
        if op == "in":
            parts.append(f"{col} in [{', '.join(_milvus_val(x) for x in v)}]")
        else:
            parts.append(f"{col} {_MILVUS_OP[op]} {_milvus_val(v)}")
    return " and ".join(parts)


# ---------------------------------------------------------------------
# Residual (post-scan on the canonical DataFrame)
# ---------------------------------------------------------------------


def _residual_cond(p: dict[str, Any]) -> Column:
    col, op, v = p["col"], p["op"], p["value"]
    c = F.col("id") if col == "id" else F.col("metadata").getItem(col)
    if op == "in":
        return c.isin([str(x) for x in v])
    if op in RANGE_OPS and _is_num(v):
        c = c.cast("double")
    else:
        v = str(v)
    return {
        "eq": lambda: c == v,
        "ne": lambda: c != v,
        "gt": lambda: c > v,
        "gte": lambda: c >= v,
        "lt": lambda: c < v,
        "lte": lambda: c <= v,
    }[op]()


def apply_residual(df: DataFrame, preds: list[dict[str, Any]]) -> DataFrame:
    """Apply untranslatable predicates post-scan. Canonical columns are
    stringly-typed, so numeric ranges compare through a double cast and
    everything else compares as strings."""
    for p in validate(preds):
        df = df.filter(_residual_cond(p))
    return df
