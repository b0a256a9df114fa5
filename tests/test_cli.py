"""CLI contract tests (reference cli/migrate.py behaviors)."""

from __future__ import annotations

import json

from vectordb_migrator_spark import __version__
from vectordb_migrator_spark.cli import main


def test_version_fast_path(capsys):
    assert main(["--version"]) == 0
    assert capsys.readouterr().out.strip() == __version__


def test_missing_config_is_error():
    assert main([]) == 1


def test_bad_config_exit_code(tmp_path):
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps({"source": {"type": "nope"}, "target": {"type": "parquet"}}))
    assert main(["--config", str(cfg)]) == 1


def test_end_to_end_parquet_migration(spark, tmp_path):
    """Full CLI run: parquet → canonical → parquet, with a transform
    module loaded by path (reference T1 contract)."""
    out = str(tmp_path / "out")
    t = tmp_path / "t.py"
    t.write_text(
        "def transform(data):\n"
        "    for d in data:\n"
        "        d['metadata']['via'] = 'cli'\n"
        "    return data\n"
    )
    cfg = tmp_path / "c.json"
    cfg.write_text(
        json.dumps(
            {
                "source": {
                    "type": "parquet",
                    "query": {
                        "path": "/root/testdata/sf0.001/embeddings.parquet",
                        "id_column": "vec_id",
                        "vector_column": "embedding",
                        "metadata_columns": ["label"],
                        "limit": 50,
                    },
                },
                "target": {"type": "parquet", "load": {"path": out}},
            }
        )
    )
    assert main(["--config", str(cfg), "--transform", str(t), "--cpus", "8"]) == 0
    got = spark.read.parquet(out)
    assert got.count() == 50
    assert got.filter("metadata['via'] = 'cli'").count() == 50


def test_broken_transform_degrades_with_warning(spark, tmp_path, caplog):
    """Missing transform module → warning + continue (reference
    cli/migrate.py:85-93), not an abort."""
    out = str(tmp_path / "out2")
    cfg = tmp_path / "c.json"
    cfg.write_text(
        json.dumps(
            {
                "source": {
                    "type": "parquet",
                    "query": {
                        "path": "/root/testdata/sf0.001/embeddings.parquet",
                        "id_column": "vec_id",
                        "vector_column": "embedding",
                        "limit": 5,
                    },
                },
                "target": {"type": "parquet", "load": {"path": out}},
            }
        )
    )
    rc = main(
        ["--config", str(cfg), "--transform", str(tmp_path / "missing.py"), "--cpus", "8"]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() == 5
