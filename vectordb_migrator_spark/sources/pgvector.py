"""pgvector / PostgreSQL adapter over Spark JDBC.

Reference: ``adapters/pgvector.py`` — single-cursor ``SELECT``
(:64-132), per-row normalization (:117-126), batched ``executemany``
INSERT with optional DDL (:134-242).

Spark rebuild:
- **read** — ``spark.read.format("jdbc")`` with a pushed-down query.
  The pg ``vector`` type has no JDBC mapping, so it is cast to ``text``
  server-side and parsed to ``array<float>`` with the C1 expression
  bridge (``canonical.parse_pgvector_text``). Scan parallelism comes
  from ``partitionColumn/lowerBound/upperBound/numPartitions`` on the
  id column — N executors each read an id range, replacing the
  reference's single cursor. At 100 TB this is the difference between
  a day and an hour: reads scale linearly with executors while the
  per-range WHERE keeps each query index-friendly.
- **write** — JDBC batch insert (``batchsize``) of the canonical
  columns with the vector serialized back to pgvector text form; table
  DDL (CREATE EXTENSION / CREATE TABLE / optional drop —
  ``adapters/pgvector.py:162-196``) runs once on the driver via a raw
  psycopg2/pg8000 connection when available.

Requires a PostgreSQL JDBC driver jar on the Spark classpath (not
bundled in this container — the code path is unit-tested by asserting
the reader/writer configuration, like the reference's mocked-cursor
tests ``tests/test_pgvector_adapter.py:104-105``).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_migrator_spark.canonical import (
    format_pgvector_text,
    parse_pgvector_text,
    to_canonical_columns,
)
from vectordb_migrator_spark.operators.slicing import limit_offset
from vectordb_migrator_spark.sources.base import SparkAdapter


def jdbc_url(connection: dict[str, Any]) -> str:
    host = connection.get("host", "localhost")
    port = connection.get("port", 5432)
    dbname = connection.get("dbname") or connection.get("database", "postgres")
    return f"jdbc:postgresql://{host}:{port}/{dbname}"


def build_select(query: dict[str, Any]) -> str:
    """Compose the pushdown SELECT — the reference's f-string SQL
    builder (``adapters/pgvector.py:95-106``), with the vector column
    cast to text for the JDBC bridge. LIMIT/OFFSET are intentionally
    NOT inlined here: Spark applies them post-scan (or via
    ``pushDownLimit``) so partitioned reads stay correct.
    """
    table = query.get("table_name", "items")
    id_c = query.get("id_column", "id")
    vec_c = query.get("vector_column", "embedding")
    meta_cs = query.get("metadata_columns", []) or []
    cols = [id_c, f"{vec_c}::text AS {vec_c}", *meta_cs]
    sql = f"SELECT {', '.join(cols)} FROM {table}"
    cond = query.get("filter_condition")
    if cond:
        sql += f" WHERE {cond}"
    return sql


def _default_connect(connection: dict[str, Any]):
    """Driver-side DBAPI connection for DDL the JDBC writer can't issue
    (``CREATE EXTENSION``). Tries psycopg2 then pg8000; returns None
    when neither is installed so the caller can fall back to the
    JDBC-only path."""
    kwargs = dict(
        host=connection.get("host", "localhost"),
        port=connection.get("port", 5432),
        user=connection.get("user", "postgres"),
        password=connection.get("password", ""),
    )
    dbname = connection.get("dbname") or connection.get("database", "postgres")
    try:
        import psycopg2

        return psycopg2.connect(dbname=dbname, **kwargs)
    except ImportError:
        pass
    try:
        import pg8000.dbapi

        return pg8000.dbapi.Connection(database=dbname, **kwargs)
    except ImportError:
        return None


import re as _re

_IDENT_RE = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def safe_ident(name: str) -> str:
    """Validate a config-supplied SQL identifier before it is
    interpolated into driver-side DDL (CREATE/DROP/ALTER). Configs are
    untrusted input and the staging swap includes a destructive DROP —
    a strict ``[A-Za-z_][A-Za-z0-9_]*`` whitelist (no quoting games,
    no mixed-case escapes) closes the injection path while matching
    every name the reference's own examples use."""
    if not isinstance(name, str) or not _IDENT_RE.match(name):
        raise ValueError(
            f"unsafe SQL identifier from config: {name!r} "
            "(must match [A-Za-z_][A-Za-z0-9_]*)"
        )
    return name


def _write_mode(load: dict[str, Any], table_bootstrapped: bool) -> str:
    """JDBC save mode: when ensure_table already issued the DDL, append
    into the freshly-created table instead of letting JDBC drop it
    again; recreate_table without a bootstrap keeps the legacy JDBC
    overwrite (requires the vector extension to pre-exist)."""
    if table_bootstrapped or not load.get("recreate_table"):
        return "append"
    return "overwrite"


class PgVectorAdapter(SparkAdapter):
    name = "pgvector"
    write_is_sql_action = True  # JDBC df.write — fires observations

    def __init__(self, connect_factory=None):
        self.connect_factory = connect_factory or _default_connect

    def ensure_table(
        self, connection: dict[str, Any], load: dict[str, Any], dim: int
    ) -> bool:
        """Driver-side DDL bootstrap mirroring the reference
        (``adapters/pgvector.py:162-196``): DROP TABLE IF EXISTS,
        ``CREATE EXTENSION IF NOT EXISTS vector`` (the step a plain
        JDBC overwrite cannot do on a fresh database), then CREATE
        TABLE with a SERIAL PK, a ``VECTOR(dim)`` column, and TEXT
        metadata columns. Runs ONCE on the driver. Returns False when
        no DBAPI driver is available — the writer then falls back to
        JDBC overwrite + createTableColumnTypes (which needs the
        extension to pre-exist)."""
        conn = self.connect_factory(connection)
        if conn is None:
            return False
        table = safe_ident(load.get("table_name", "items"))
        id_c = safe_ident(load.get("id_column", "id"))
        vec_c = safe_ident(load.get("vector_column", "embedding"))
        meta_cs = [safe_ident(c) for c in load.get("metadata_columns", []) or []]
        cols = [f"{id_c} SERIAL PRIMARY KEY", f"{vec_c} VECTOR({dim})"]
        cols += [f"{c} TEXT" for c in meta_cs]
        try:
            cur = conn.cursor()
            cur.execute(f"DROP TABLE IF EXISTS {table};")
            cur.execute("CREATE EXTENSION IF NOT EXISTS vector;")
            cur.execute(f"CREATE TABLE {table} ({', '.join(cols)});")
            conn.commit()
            return True
        finally:
            conn.close()

    def reader(
        self, spark: SparkSession, connection: dict[str, Any], query: dict[str, Any]
    ):
        """Configure (but don't trigger) the JDBC read — separated so
        tests can assert options without a live server."""
        reader = (
            spark.read.format("jdbc")
            .option("url", jdbc_url(connection))
            .option("user", connection.get("user", "postgres"))
            .option("password", connection.get("password", ""))
            .option("driver", "org.postgresql.Driver")
            .option("query", build_select(query))
            .option("fetchsize", str(query.get("fetch_size", 10_000)))
        )
        # Partitioned scan over the id range — replaces the
        # reference's single serial cursor. Bounds may be supplied or
        # auto-derived (one cheap MIN/MAX probe, see derive_bounds);
        # stale bounds are safe: JDBC clamps the first/last partition
        # predicates to an open range, so rows outside are still read.
        if "num_partitions" in query:
            lo, hi = query.get("lower_bound"), query.get("upper_bound")
            if hi is None:
                dlo, dhi = self.derive_bounds(spark, connection, query)
                lo, hi = (dlo if lo is None else lo), dhi
            elif lo is None:
                lo = 0
            reader = (
                reader.option("partitionColumn", query.get("id_column", "id"))
                .option("lowerBound", str(lo))
                .option("upperBound", str(hi))
                .option("numPartitions", str(query["num_partitions"]))
            )
        return reader

    def derive_bounds(
        self, spark: SparkSession, connection: dict[str, Any], query: dict[str, Any]
    ) -> tuple[int, int]:
        """MIN/MAX of the partition column via one 1-row JDBC probe —
        index-only on a PK id, so effectively free next to the scan it
        parallelizes. Auto-derivation beats guessed bounds at scale:
        with a hardcoded upper bound of 1e6 over an id space of 1e9,
        999/1000 of the table lands in ONE clamped edge partition and
        the scan is serial again. The probe honors filter_condition so
        a filtered read partitions over the surviving range."""
        id_c = query.get("id_column", "id")
        table = query.get("table_name", "items")
        q = f"SELECT MIN({id_c}) AS lo, MAX({id_c}) AS hi FROM {table}"
        cond = query.get("filter_condition")
        if cond:
            q += f" WHERE {cond}"
        row = self._jdbc_query(spark, connection, q).collect()[0]
        lo = int(row["lo"]) if row["lo"] is not None else 0
        hi = int(row["hi"]) if row["hi"] is not None else 0
        return lo, max(hi, lo + 1)  # JDBC requires lower < upper

    def read(
        self, spark: SparkSession, connection: dict[str, Any], query: dict[str, Any]
    ) -> DataFrame:
        raw = self.reader(spark, connection, query).load()
        vec_c = query.get("vector_column", "embedding")
        id_c = query.get("id_column", "id")
        raw = raw.withColumn(vec_c, parse_pgvector_text(F.col(vec_c)))
        raw = limit_offset(
            raw, limit=query.get("limit"), offset=query.get("offset", 0), order_by=id_c
        )
        return to_canonical_columns(
            raw,
            id_column=id_c,
            vector_column=vec_c,
            metadata_columns=query.get("metadata_columns", []),
        )

    def writer(
        self,
        df: DataFrame,
        connection: dict[str, Any],
        load: dict[str, Any],
        *,
        table_bootstrapped: bool = False,
    ):
        table = load.get("table_name", "items")
        id_c = load.get("id_column", "id")
        vec_c = load.get("vector_column", "embedding")
        meta_keys = load.get("metadata_columns", [])
        out = df.select(
            F.col("id").alias(id_c),
            format_pgvector_text(F.col("vector")).alias(vec_c),
            *[F.col("metadata").getItem(k).alias(k) for k in meta_keys],
        )
        mode = _write_mode(load, table_bootstrapped)
        return (
            out.write.format("jdbc")
            .option("url", jdbc_url(connection))
            .option("user", connection.get("user", "postgres"))
            .option("password", connection.get("password", ""))
            .option("driver", "org.postgresql.Driver")
            .option("dbtable", table)
            # per-executor batched inserts — the reference's
            # executemany batching (adapters/pgvector.py:223-233),
            # default batch 100 → we default far larger; JDBC batches
            # are cheap and the reference default is a bottleneck.
            .option("batchsize", str(load.get("batch_size", 10_000)))
            # lets text literals bind into a `vector` column
            .option("stringtype", "unspecified")
            .option(
                "createTableColumnTypes",
                load.get(
                    "create_table_column_types",
                    f"{vec_c} VECTOR",
                ),
            )
            .mode(mode)
        )

    def swap_staging(
        self, connection: dict[str, Any], load: dict[str, Any]
    ) -> bool:
        """Atomically publish ``{table}__staging`` as ``{table}``: one
        driver-side transaction doing DROP-old + RENAME-staging.
        Postgres DDL is transactional, so concurrent readers see
        either the complete old table or the complete new one — never
        a half-written load. This is the distributed answer to the
        reference's single-connection commit-at-the-end semantics
        (``adapters/pgvector.py:235-241``), which cannot exist when N
        executors hold N connections (SURVEY §7.6.5): per-partition
        JDBC commits land invisibly in staging; the swap is the single
        atomic commit point."""
        conn = self.connect_factory(connection)
        if conn is None:
            return False
        table = safe_ident(load.get("table_name", "items"))
        try:
            cur = conn.cursor()
            cur.execute(f"DROP TABLE IF EXISTS {table};")
            cur.execute(f"ALTER TABLE {table}__staging RENAME TO {table};")
            conn.commit()
            return True
        finally:
            conn.close()

    def write(
        self, df: DataFrame, connection: dict[str, Any], load: dict[str, Any]
    ) -> dict[str, Any]:
        staging = bool(load.get("staging_swap"))
        eff_load = dict(load)
        if staging:
            # stage into {table}__staging (always freshly created),
            # then swap-publish atomically after the JDBC stage lands
            eff_load["table_name"] = load.get("table_name", "items") + "__staging"
            eff_load["recreate_table"] = True
        bootstrapped = False
        if eff_load.get("recreate_table"):
            dim = eff_load.get("vector_dimension")
            if dim is None:
                first = (
                    df.select(F.size("vector").alias("d"))
                    .filter("d is not null")
                    .first()
                )
                dim = int(first["d"]) if first else 0
            bootstrapped = self.ensure_table(connection, eff_load, int(dim))
        self.writer(df, connection, eff_load, table_bootstrapped=bootstrapped).save()
        if staging:
            if not self.swap_staging(connection, load):
                raise RuntimeError(
                    "staging_swap requires a driver-side DBAPI connection "
                    "(none available) — data remains in "
                    f"{eff_load['table_name']}"
                )
            return {
                "table": load.get("table_name", "items"),
                "mode": "jdbc-staging-swap",
            }
        return {"table": load.get("table_name", "items"), "mode": "jdbc-append"}

    def _jdbc_query(self, spark: SparkSession, connection: dict[str, Any], q: str):
        return (
            spark.read.format("jdbc")
            .option("url", jdbc_url(connection))
            .option("user", connection.get("user", "postgres"))
            .option("password", connection.get("password", ""))
            .option("driver", "org.postgresql.Driver")
            .option("query", q)
            .load()
        )

    def get_schema_info(
        self, spark: SparkSession, connection: dict[str, Any], entity: str
    ) -> dict[str, Any]:
        """information_schema introspection + vector-dimension probe
        (``adapters/pgvector.py:262-285``) via JDBC instead of a
        psycopg2 cursor. The reference samples one row of the first
        vector column and reports ``len(sample)``; here the sample is
        the pgvector text form (``'[0.1,0.2,…]'``) pulled through the
        JDBC text bridge, so the dimension is its element count. The
        udt_name is matched too: pgvector columns surface in
        information_schema as data_type 'USER-DEFINED' with udt_name
        'vector' (the reference matches data_type == 'vector' only,
        which modern information_schema never reports)."""
        q = (
            "SELECT column_name, data_type, udt_name "
            f"FROM information_schema.columns WHERE table_name = '{entity}'"
        )
        rows = self._jdbc_query(spark, connection, q).collect()
        columns = {r[0]: r[1] for r in rows}
        vector_columns = [
            r[0] for r in rows if "vector" in (r[1], r[2])
        ]
        vector_dim = None
        if vector_columns:
            vc = vector_columns[0]
            sample = self._jdbc_query(
                spark,
                connection,
                f"SELECT {vc}::text AS v FROM {entity} "
                f"WHERE {vc} IS NOT NULL LIMIT 1",
            ).collect()
            if sample and sample[0][0]:
                vector_dim = len(sample[0][0].strip("[]").split(","))
        return {
            "table": entity,
            "columns": columns,
            "vector_columns": vector_columns,
            "vector_dimension": vector_dim,
        }
