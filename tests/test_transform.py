"""T1 transform-surface tests (reference layer: tests/test_cli.py
transform loading, tests/test_core.py transform application)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_migrator_spark.canonical import CANONICAL_SCHEMA
from vectordb_migrator_spark.operators.transform import (
    add_source_tracking,
    apply_transform,
    load_transform_function,
)


def test_load_transform_from_file(tmp_path):
    mod = tmp_path / "t.py"
    mod.write_text(
        "def transform(data):\n"
        "    return [d for d in data if d['id'] != '1']\n"
    )
    fn = load_transform_function(str(mod))
    assert fn([{"id": "1"}, {"id": "2"}]) == [{"id": "2"}]


def test_load_transform_degrades_to_none(tmp_path, capsys):
    # reference cli/migrate.py:85-93 — warn, don't abort
    assert load_transform_function(str(tmp_path / "missing.py")) is None
    mod = tmp_path / "not_a_transform.py"
    mod.write_text("x = 1\n")
    assert load_transform_function(str(mod)) is None


def test_add_source_tracking(spark):
    # reference examples/add_source_tracking.py:12-47
    df = spark.createDataFrame([("1", None, None)], CANONICAL_SCHEMA)
    out = apply_transform(
        df, add_source_tracking("pgvector", timestamp="2026-01-01T00:00:00")
    ).first()
    assert out["metadata"] == {
        "source_db": "pgvector",
        "migration_timestamp": "2026-01-01T00:00:00",
    }


def test_transform_can_modify_vectors(spark):
    # reference README.md:162-186 — "modify vector values"
    df = spark.createDataFrame([("1", [1.0, 2.0], {})], CANONICAL_SCHEMA)

    def double_vec(data):
        for d in data:
            d["vector"] = [x * 2 for x in d["vector"]]
        return data

    out = apply_transform(df, double_vec).first()
    assert out["vector"] == [2.0, 4.0]


def test_none_transform_is_identity(spark):
    df = spark.createDataFrame([("1", None, {})], CANONICAL_SCHEMA)
    assert apply_transform(df, None) is df
