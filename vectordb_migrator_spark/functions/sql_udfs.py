"""SQL-callable vector kernels — the pure-SQL API surface.

The reference exposes its capabilities only through Python config
(`core/migrator.py:42-111`); a Spark-native engine should also be
usable from ``spark.sql(...)`` alone. Spark 4 SQL scalar UDFs
(``CREATE FUNCTION ... RETURNS ... RETURN <expr>``) make that free:
the body is a SQL *expression*, so Catalyst inlines it into the
calling plan and it compiles into whole-stage codegen exactly like
the Column-API kernels in :mod:`vectordb_migrator_spark.functions
.vector` — no UDF dispatch, no Python, no serialization boundary.
``EXPLAIN`` on a query using ``vm_cosine`` shows the same folded
aggregate/zip_with tree as :func:`cosine_similarity`.

Call :func:`register_sql_functions` once per session (idempotent —
``CREATE OR REPLACE``); every function is prefixed ``vm_`` to stay
out of the way of built-ins.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DOT = "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x)"
_NORM_A = "sqrt(aggregate(a, 0D, (s, x) -> s + x * x))"
_NORM_B = "sqrt(aggregate(b, 0D, (s, x) -> s + x * x))"

SQL_FUNCTIONS: dict[str, str] = {
    "vm_dot": f"""
        CREATE OR REPLACE TEMPORARY FUNCTION vm_dot(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN {_DOT}
    """,
    "vm_norm": """
        CREATE OR REPLACE TEMPORARY FUNCTION vm_norm(a ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN sqrt(aggregate(a, 0D, (s, x) -> s + x * x))
    """,
    "vm_cosine": f"""
        CREATE OR REPLACE TEMPORARY FUNCTION vm_cosine(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN {_DOT} / ({_NORM_A} * {_NORM_B})
    """,
    "vm_l2_dist": """
        CREATE OR REPLACE TEMPORARY FUNCTION vm_l2_dist(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
                              0D, (s, x) -> s + x))
    """,
    "vm_l2_normalize": """
        CREATE OR REPLACE TEMPORARY FUNCTION vm_l2_normalize(a ARRAY<DOUBLE>)
        RETURNS ARRAY<DOUBLE>
        RETURN transform(a, x -> x / sqrt(aggregate(a, 0D, (s, y) -> s + y * y)))
    """,
    "vm_token_count": """
        CREATE OR REPLACE TEMPORARY FUNCTION vm_token_count(t STRING)
        RETURNS INT
        RETURN size(filter(split(trim(t), '\\\\s+'), x -> x != ''))
    """,
    "vm_jaccard": """
        CREATE OR REPLACE TEMPORARY FUNCTION vm_jaccard(
            a ARRAY<STRING>, b ARRAY<STRING>) RETURNS DOUBLE
        RETURN size(array_intersect(a, b)) /
               CAST(size(array_union(a, b)) AS DOUBLE)
    """,
    "vm_hamming64": """
        CREATE OR REPLACE TEMPORARY FUNCTION vm_hamming64(
            a BIGINT, b BIGINT) RETURNS INT
        RETURN bit_count(a ^ b)
    """,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every ``vm_*`` SQL function on the session; returns
    the registered names (sorted, for introspection/tests)."""
    for ddl in SQL_FUNCTIONS.values():
        spark.sql(ddl)
    return sorted(SQL_FUNCTIONS)
