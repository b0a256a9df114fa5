"""Registry family ``s03_dedup`` — split from the monolithic
suite.py (round 8); registration order preserved via the
package ``__init__`` import sequence."""

from __future__ import annotations

# ruff: noqa: E501
from vectordb_migrator_spark.suite._shared import (
    DataFrame,
    SparkSession,
    _t,
    embedding_near_dup_pairs,
    exact_text_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    query,
    simhash_near_dup_pairs,
)



# =====================================================================
# X1/X2 — deduplication
# =====================================================================


@query(
    "x1_dedup_exact_text",
    """
    SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS n_dups
    FROM documents GROUP BY substr(md5(text), 1, 16)
    ORDER BY keep_id
    """,
)
def x1_dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — exact text dedup by content hash; only the 24-byte
    (hash, id) pair crosses the shuffle, never the document."""
    return exact_text_dedup(_t(spark, sf_dir, "documents")).orderBy("keep_id")


@query(
    "x1_dedup_exact_vector",
    """
    SELECT min(vec_id) AS keep_id, count(*)::BIGINT AS n_dups
    FROM embeddings GROUP BY embedding ORDER BY keep_id
    """,
)
def x1_dedup_exact_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — exact vector dedup (group directly on the float array)."""
    from vectordb_migrator_spark.operators.dedup import exact_dedup

    return exact_dedup(
        _t(spark, sf_dir, "embeddings"), ["embedding"], "vec_id"
    ).orderBy("keep_id")


@query(
    "x2_ppjoin_pairs",
    r"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct(
               CASE WHEN len(toks) >= 3
                    THEN [array_to_string(toks[i:i+2], ' ')
                          for i in range(1, len(toks) - 1)]
                    ELSE [array_to_string(toks, ' ')] END) AS g
      FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents)
    ),
    ex AS (
      SELECT id, len(g)::BIGINT AS n, unnest(g) AS gram
      FROM sh WHERE len(g) > 0
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(count(*)::DOUBLE /
                 (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE,
                 6) AS jaccard
    FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
    GROUP BY a.id, b.id
    HAVING round(count(*)::DOUBLE /
                 (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE,
                 6) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def x2_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — EXACT trigram-Jaccard join (≥ 0.5) with PPJoin prefix
    filtering (round 7): each doc indexes only its |d|−⌈t·|d|⌉+1
    globally RAREST shingles — two sets meeting the threshold must
    share a prefix token (the prefix-filtering lemma) — so the hot
    shingles that force ``x2_ngram_jaccard_pairs``'s max_df cap never
    enter the candidate join at all, and the result is still EXACT
    (verification recomputes full-set Jaccard; the oracle is the
    brute-force all-shingles join). The exact-similarity-join
    workhorse of the dedup literature next to the probabilistic
    MinHash/SimHash family (operators/dedup.py:ppjoin_pairs). Full
    oracle."""
    from vectordb_migrator_spark.operators.dedup import ppjoin_pairs

    d = _t(spark, sf_dir, "documents")
    return ppjoin_pairs(d, n=3, threshold=0.5)


@query(
    "x2_ngram_jaccard_pairs",
    r"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS g
      FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    ), ex AS (
      SELECT id, len(g)::BIGINT AS n, unnest(g) AS gram FROM sh
    ), keep AS (
      SELECT gram FROM ex GROUP BY gram HAVING count(*) <= 50
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(count(*)::DOUBLE /
                 (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE, 6)
             AS jaccard
    FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
         JOIN keep kp ON kp.gram = a.gram
    GROUP BY a.id, b.id
    HAVING count(*)::DOUBLE /
           (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE >= 0.05
    ORDER BY id_a, id_b
    """,
)
def x2_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — exact n-gram Jaccard near-dup pairs; the shingle equi-join
    is the blocking (non-overlapping pairs never meet). max_df=50
    exercises the hot-shingle document-frequency cap — the oracle
    mirrors the df filter, so the driver checks the scale path."""
    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.05, max_df=50
    ).orderBy("id_a", "id_b")


@query("x2_minhash_lsh_pairs")  # xxhash64 signatures — not SQL-expressible
def x2_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — MinHash+LSH candidate pairs, exact-Jaccard verified.
    Verified against x2_ngram_jaccard_pairs in tests (every LSH pair
    above threshold must appear in the exact pair set)."""
    return minhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"), jaccard_threshold=0.2, max_bucket=64
    ).orderBy("id_a", "id_b")


@query("x2_simhash_pairs")  # xxhash64 bit votes — not SQL-expressible
def x2_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — SimHash near-dup pairs (Hamming ≤ 8 on 64-bit fingerprints,
    4×16-bit band blocking)."""
    return simhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"), max_bucket=64
    ).orderBy("id_a", "id_b")


@query(
    "x2_embedding_near_dup",
    f"""
    WITH n AS (
      SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
                            x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                           embedding::DOUBLE[]))) AS v
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v), 6) AS cos
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) >= 0.8
    ORDER BY id_a, id_b
    """,
)
def x2_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — embedding-cosine near-dup pairs, blocked by label (the
    blocked self-join IS the 100 TB path; blocks bound the quadratic)."""
    return embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"),
        block_col="label",
        threshold=0.8,
    ).orderBy("id_a", "id_b")
