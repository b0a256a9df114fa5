"""pool_vectors — chunk→document embedding pooling."""

import pytest

from vectordb_migrator_spark.operators.pooling import pool_vectors


def test_pool_mean_and_max(spark):
    df = spark.createDataFrame(
        [
            ("a", [1.0, -2.0]),
            ("a", [3.0, 4.0]),
            ("a", [2.0, 1.0]),
            ("b", [5.0, 6.0]),  # singleton group passes through
        ],
        "doc_id string, emb array<double>",
    )
    out = {
        r["doc_id"]: r
        for r in pool_vectors(
            df, group_col="doc_id", vec_col="emb", modes=("mean", "max")
        ).collect()
    }
    assert out["a"]["mean_vec"] == [2.0, 1.0]
    assert out["a"]["max_vec"] == [3.0, 4.0]
    assert out["b"]["mean_vec"] == [5.0, 6.0]
    assert out["b"]["max_vec"] == [5.0, 6.0]


def test_pool_mean_is_order_independent(spark):
    """The decimal accumulator makes the grouped mean identical under
    any partitioning — repartition shouldn't change a single bit."""
    import random

    rng = random.Random(3)
    rows = [("d", [rng.uniform(-1, 1) for _ in range(8)]) for _ in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, emb array<double>")
    one = pool_vectors(
        df.coalesce(1), group_col="doc_id", vec_col="emb"
    ).collect()[0]["mean_vec"]
    many = pool_vectors(
        df.repartition(13), group_col="doc_id", vec_col="emb"
    ).collect()[0]["mean_vec"]
    assert one == many


def test_pool_rejects_unknown_mode(spark):
    df = spark.createDataFrame([("a", [1.0])], "doc_id string, emb array<double>")
    with pytest.raises(ValueError, match="unknown pooling mode"):
        pool_vectors(df, group_col="doc_id", vec_col="emb", modes=("median",))
