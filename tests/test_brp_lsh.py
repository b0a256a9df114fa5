"""X4 MLlib BRP-LSH: returned pairs must be exactly-verified true
near-pairs (no false positives vs the exact L2 distance)."""

from __future__ import annotations

import math

from vectordb_migrator_spark.suite import QUERIES

from tests.conftest import SF_DIR


def test_brp_pairs_are_true_near_pairs(spark, embeddings):
    out = QUERIES["x4_brp_approx_join"](spark, SF_DIR).collect()
    assert out, "expected some near pairs at the test threshold"
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in embeddings.limit(500).collect()
    }
    for r in out:
        a, b = vecs[r["id_a"]], vecs[r["id_b"]]
        exact = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
        assert exact <= 1.2 + 1e-6
        assert abs(exact - r["dist"]) <= 1e-4
