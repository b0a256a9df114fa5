"""Dedup operator tests (X1/X2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_text_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_near_dup_pairs,
)


def test_exact_text_dedup(spark):
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "cc dd")], ["doc_id", "text"]
    )
    out = {r["keep_id"]: r["n_dups"] for r in exact_text_dedup(df).collect()}
    assert out == {1: 2, 3: 1}


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["t"])
    out = [sorted(r[0]) for r in df.select(shingles("t", 3)).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == ["a b"]  # shorter than n → whole text as one shingle


def test_ngram_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "utterly unrelated words entirely")],
        ["doc_id", "text"],
    )
    out = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert len(out) == 1
    assert (out[0]["id_a"], out[0]["id_b"], out[0]["jaccard"]) == (1, 2, 1.0)


def test_minhash_agrees_with_exact(documents):
    """Every LSH-surfaced pair must also be in the exact-Jaccard pair
    set at the same threshold (LSH has no false positives after the
    verify step); recall on clear dups (j≥0.5) must be 100% here."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(documents, threshold=0.2).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(documents, jaccard_threshold=0.2).collect()
    }
    assert set(lsh) <= set(exact)
    clear = {p for p, j in exact.items() if j >= 0.5}
    assert clear <= set(lsh)


def test_simhash_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "same words here"), (2, "same words here")], ["doc_id", "text"]
    )
    sigs = [r[0] for r in df.select(simhash64("text")).collect()]
    assert sigs[0] == sigs[1]
    pairs = simhash_near_dup_pairs(df, max_hamming=0).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]


def test_embedding_near_dup_blocked_vs_exact(embeddings):
    """Label-blocked pairs are a subset of all-pairs at the same
    threshold, and within-block results agree exactly."""
    blocked = embedding_near_dup_pairs(
        embeddings, block_col="label", threshold=0.7
    ).collect()
    allp = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(embeddings, threshold=0.7).collect()
    }
    for r in blocked:
        assert allp[(r["id_a"], r["id_b"])] == r["cos"]


def test_dedup_plan_shuffles_hash_not_payload(documents):
    """Scale guard: the exact-dedup exchange must carry (fp, id), not
    the text column."""
    plan = (
        exact_text_dedup(documents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exchange = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchange and all("text" not in ln for ln in exchange)
