"""Canonical model unit tests (reference layer: tests/test_core.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_migrator_spark.canonical import (
    coerce_id,
    conform_to_schema,
    drop_missing_ids,
    format_pgvector_text,
    parse_pgvector_text,
    to_canonical_columns,
    vector_dims,
)


def test_parse_pgvector_text(spark):
    df = spark.createDataFrame(
        [("[0.1,0.2,0.3]",), ("[1, 2, 3]",), (None,), ("",), ("[]",)], ["v"]
    )
    out = df.select(parse_pgvector_text("v").alias("p")).collect()
    assert [r["p"] for r in out][:2] == [
        [0.10000000149011612, 0.20000000298023224, 0.30000001192092896],
        [1.0, 2.0, 3.0],
    ]
    assert all(r["p"] is None for r in out[2:])


def test_pgvector_roundtrip(spark):
    df = spark.createDataFrame([([0.25, -1.5, 3.0],)], "v array<float>")
    out = df.select(
        parse_pgvector_text(format_pgvector_text("v")).alias("p")
    ).first()
    assert out["p"] == [0.25, -1.5, 3.0]


def test_coerce_id(spark):
    big = "340282366920938463463374607431768211455"  # 2^128 - 1
    df = spark.createDataFrame(
        [("007",), ("42",), ("doc-1",), ("",), (big,), ("00" + big,), ("000",)],
        ["i"],
    )
    vals = [r[0] for r in df.select(coerce_id("i")).collect()]
    # >19-digit ids must canonicalize losslessly (reference int() is
    # arbitrary-precision; a long cast would overflow to NULL and the
    # row would later be dropped by drop_missing_ids)
    assert vals == ["7", "42", "doc-1", "", big, big, "0"]


def test_to_canonical_shape(embeddings):
    canon = to_canonical_columns(
        embeddings, id_column="vec_id", vector_column="embedding",
        metadata_columns=["label"],
    )
    assert canon.schema.simpleString() == (
        "struct<id:string,vector:array<float>,metadata:map<string,string>>"
    )
    row = canon.orderBy(F.col("id").cast("long")).first()
    assert row["id"] == "0" and len(row["vector"]) == 64
    assert row["metadata"] == {"label": "5"}


def test_metadata_null_dropped(spark):
    df = spark.createDataFrame([(1, None, "x")], "id int, a string, b string")
    canon = to_canonical_columns(df, id_column="id", metadata_columns=["a", "b"])
    assert canon.first()["metadata"] == {"b": "x"}


def test_drop_missing_ids(spark):
    df = spark.createDataFrame([("1",), (None,)], ["id"])
    assert drop_missing_ids(df).count() == 1


def test_conform_to_schema(spark):
    df = spark.createDataFrame(
        [("1", None, {"keep": "v", "drop": "w"})],
        "id string, vector array<float>, metadata map<string,string>",
    )
    out = conform_to_schema(df, ["keep", "absent"]).first()
    assert out["keep"] == "v" and out["absent"] is None
    assert "drop" not in out.asDict()


def test_vector_dims(embeddings):
    dims = vector_dims(embeddings, "embedding").collect()
    assert len(dims) == 1 and dims[0]["dim"] == 64
