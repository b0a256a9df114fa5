"""Registry family ``s09_extensions_a`` — split from the monolithic
suite.py (round 8); registration order preserved via the
package ``__init__`` import sequence."""

from __future__ import annotations

# ruff: noqa: E501
from vectordb_migrator_spark.suite._shared import (
    DataFrame,
    F,
    ORACLES,
    QUERIES,
    SparkSession,
    W,
    _t,
    ngram_jaccard_pairs,
    query,
    token_count_ws,
)



# =====================================================================
# Round-4 additions — semantic dedup, hard negatives, source mixing,
# pure-SQL API surface
# =====================================================================


@query(
    "x2_semdedup",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id < 8
    ),
    d AS (
      SELECT e.vec_id, e.label, e.embedding::DOUBLE[] AS v, c.cid,
             list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cv),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      FROM embeddings e, cent c
    ),
    a AS (
      SELECT vec_id, label, v, cid AS cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn FROM d)
      WHERE rn = 1
    ),
    n AS (
      SELECT vec_id, label, cluster,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
      FROM a
    ),
    c AS (
      SELECT cluster, count(*) AS n_bkt, min(vec_id) AS anchor
      FROM n GROUP BY cluster
    ),
    losers AS (
      SELECT DISTINCT b.vec_id
      FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN c ON c.cluster = a.cluster
      WHERE (c.n_bkt <= 40 OR a.vec_id = c.anchor)
        AND list_dot_product(a.nv, b.nv) >= 0.8
    )
    SELECT vec_id, label, cluster::BIGINT AS cluster
    FROM a WHERE vec_id NOT IN (SELECT vec_id FROM losers)
    ORDER BY vec_id
    """,
)
def x2_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — SemDeDup (arXiv:2303.09540): nearest-centroid clustering
    bounds the near-dup self-join per cluster; direct-pair smaller-id
    survivor within each cluster, with the min-id star-cap on
    oversized clusters (same skew guard as every other pair
    generator — the oracle replicates the cap). Centroids here are
    the k=8 sampled seed rows (deterministic, oracle-reconstructable)
    — production fits them with ``clustering.kmeans_fit``."""
    from vectordb_migrator_spark.operators.dedup import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < 8)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    return (
        semantic_dedup(e, cents, threshold=0.8, max_bucket=40)
        .select("vec_id", "label", F.col("cluster").cast("long").alias("cluster"))
        .orderBy("vec_id")
    )


@query("x2_semdedup_fitted")  # iterative Lloyd fit — not SQL-expressible
def x2_semdedup_fitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — the PRODUCTION SemDeDup composition: ``kmeans_fit`` (k=8,
    deterministic Lloyd over a persisted two-column projection) fits
    the cluster centroids, then ``semantic_dedup`` blocks the near-dup
    self-join on them. The seeded-centroid twin ``x2_semdedup`` keeps
    the full DuckDB oracle; this entry exercises the fitted path the
    paper actually runs (rows-only here — the Lloyd loop has no SQL
    oracle; differential-tested against a NumPy Lloyd+SemDeDup replica
    in tests/test_clustering.py)."""
    from vectordb_migrator_spark.operators.clustering import kmeans_fit
    from vectordb_migrator_spark.operators.dedup import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    _, centroids, _ = kmeans_fit(e, k=8, max_iter=10)
    return (
        semantic_dedup(e, centroids, threshold=0.8, max_bucket=40)
        .select("vec_id", "label", F.col("cluster").cast("long").alias("cluster"))
        .orderBy("vec_id")
    )


@query(
    "x3_hard_negatives",
    """
    WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.q_id, e.vec_id AS c_id, e.label AS c_label,
             round(list_dot_product(e.embedding::DOUBLE[], q.qv) /
                   (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
      FROM embeddings e, q
      WHERE e.label != q.q_label
    )
    SELECT * FROM (
      SELECT q_id, c_id, c_label, score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score DESC, c_id)::BIGINT AS rank
      FROM scored)
    WHERE rank <= 5 ORDER BY q_id, rank
    """,
)
def x3_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — hard-negative mining (contrastive-training recipe): per
    query, the top-5 most-similar corpus rows with a DIFFERENT label.
    Broadcast query side; (n_queries × k)-row shuffle only."""
    from vectordb_migrator_spark.operators.similarity import hard_negative_join

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    corpus = e.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_vec"),
    )
    return hard_negative_join(
        queries,
        corpus,
        k=5,
        corpus_label="c_label",
    ).orderBy("q_id", "rank")


@query(
    "x10_source_mixture",
    r"""
    WITH per AS (
      SELECT source,
             sum(len(string_split_regex(lower(trim(text)), '\s+')))::DOUBLE
               AS size
      FROM documents GROUP BY source
    ),
    d AS (SELECT sum(pow(size, 0.5)) AS denom FROM per)
    SELECT source, size,
           round(pow(size, 0.5) / denom, 6) AS weight,
           round(round(pow(size, 0.5) / denom, 6) * 10000000.0, 2) AS target,
           round(round(round(pow(size, 0.5) / denom, 6) * 10000000.0, 2)
                 / size, 6) AS epochs
    FROM per, d ORDER BY source
    """,
)
def x10_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — temperature-based source mixing (alpha=0.5 multinomial
    weights over per-source token counts, 10M-token budget): ONE
    map-side-combinable shuffle; the normalizer is a broadcast 1-row
    frame derived from the per-source aggregate."""
    from vectordb_migrator_spark.functions.text import token_count_ws
    from vectordb_migrator_spark.operators.slicing import source_mixture

    return source_mixture(
        _t(spark, sf_dir, "documents"),
        source_col="source",
        size_col=token_count_ws("text"),
        alpha=0.5,
        budget=10_000_000,
    ).orderBy("source")


@query(
    "x10_dedup_aware_mixture",
    r"""
    WITH RECURSIVE sh AS (
      SELECT doc_id AS id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS g
      FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    ), ex AS (
      SELECT id, len(g)::BIGINT AS n, unnest(g) AS gram FROM sh
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
      GROUP BY a.id, b.id
      HAVING count(*)::DOUBLE /
             (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE >= 0.2
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), comp AS (
      SELECT a AS id, least(a, min(b))::BIGINT AS comp
      FROM reach GROUP BY a
    ), drop_ids AS (
      SELECT id FROM comp WHERE id != comp
    ), gross AS (
      SELECT source,
             sum(len(string_split_regex(lower(trim(text)), '\s+')))::DOUBLE
               AS gross_size
      FROM documents GROUP BY source
    ), net AS (
      SELECT source,
             sum(len(string_split_regex(lower(trim(text)), '\s+')))::DOUBLE
               AS net_size
      FROM documents
      WHERE doc_id NOT IN (SELECT id FROM drop_ids)
      GROUP BY source
    ), gd AS (SELECT sum(pow(gross_size, 0.5)) AS gdenom FROM gross),
    nd AS (SELECT sum(pow(net_size, 0.5)) AS ndenom FROM net)
    SELECT g.source, g.gross_size, n.net_size,
           round(pow(g.gross_size, 0.5) / gdenom, 6) AS gross_weight,
           round(pow(n.net_size, 0.5) / ndenom, 6) AS net_weight,
           round(round(pow(n.net_size, 0.5) / ndenom, 6)
                 - round(pow(g.gross_size, 0.5) / gdenom, 6), 6) AS shift
    FROM gross g JOIN net n USING (source), gd, nd
    ORDER BY source
    """,
)
def x10_dedup_aware_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — mixture weights NET of near-duplicates (round 7): a
    source that syndicates copies self-inflates its token count, so
    temperature weights computed on the raw corpus over-sample it;
    compute the alpha=0.5 weights on BOTH the raw corpus and the
    dedup-representative corpus (near-dup pairs → CC → keep min-id
    rep) and report the per-source weight shift — the table that says
    which feeds were riding on duplication. Composes the existing
    pair/CC/apply operators; the only corpus-sized work is the shared
    pair kernel + two token aggregates (both map-side combinable);
    dedup's join side is duplicate-sized. Full oracle (recursive-CTE
    closure, same as the dedup family)."""
    from vectordb_migrator_spark.functions.text import token_count_ws
    from vectordb_migrator_spark.operators.dedup import apply_dedup
    from vectordb_migrator_spark.operators.graph import connected_components
    from vectordb_migrator_spark.operators.slicing import source_mixture

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2)
    kept = apply_dedup(docs, connected_components(pairs))
    gross = source_mixture(
        docs, source_col="source", size_col=token_count_ws("text"), alpha=0.5
    ).select(
        "source",
        F.col("size").alias("gross_size"),
        F.col("weight").alias("gross_weight"),
    )
    net = source_mixture(
        kept, source_col="source", size_col=token_count_ws("text"), alpha=0.5
    ).select(
        "source",
        F.col("size").alias("net_size"),
        F.col("weight").alias("net_weight"),
    )
    return (
        gross.join(net, "source")
        .select(
            "source",
            "gross_size",
            "net_size",
            "gross_weight",
            "net_weight",
            F.round(F.col("net_weight") - F.col("gross_weight"), 6).alias(
                "shift"
            ),
        )
        .orderBy("source")
    )


@query(
    "x5_span_dedup",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, i - 1 AS start,
             array_to_string(toks[i:i+2], ' ') AS gram
      FROM t, unnest(range(1, len(toks) - 1)) r(i)
      WHERE len(toks) >= 3
    ),
    spans AS (
      SELECT gram, min(doc_id) AS keeper
      FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1
    ),
    cov AS (
      SELECT DISTINCT g.doc_id, p.pos
      FROM g JOIN spans USING (gram),
           unnest(range(g.start, g.start + 3)) p(pos)
      WHERE g.doc_id != spans.keeper
    ),
    pos AS (
      SELECT doc_id, i - 1 AS pos, toks[i] AS tok
      FROM t, unnest(range(1, len(toks) + 1)) r(i)
    ),
    kept AS (
      SELECT p.doc_id, p.pos, p.tok
      FROM pos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.pos = p.pos
      WHERE c.pos IS NULL
    ),
    agg AS (
      SELECT doc_id,
             string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             count(*)::BIGINT AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           len(t.toks)::BIGINT AS n_tokens,
           (len(t.toks) - coalesce(a.n_kept, 0))::BIGINT AS n_removed
    FROM t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def x5_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — cross-document repeated-span removal (Lee et al. 2022
    substring dedup, keep-first): every 3-token window occurring in
    >1 document is removed everywhere except the smallest-id doc.
    Windows form in codegen; one (gram → df, keeper) shuffle; the
    df>1 filter shrinks the span table before the gram-keyed join
    back; reassembly restores order from carried positions."""
    from vectordb_migrator_spark.operators.cleaning import remove_repeated_spans

    return remove_repeated_spans(
        _t(spark, sf_dir, "documents"), n=3
    ).orderBy("doc_id")


_FHB_SQL = (  # token array -> per-token md5 bucket array (one hash pass)
    "list_transform(list_filter(string_split_regex(lower(trim({col})), "
    "'\\s+'), t -> t != ''), "
    "t -> CAST(CONCAT('0x', substr(md5(t), 1, 8)) AS BIGINT) % 16)"
)
_FHV_SQL = (  # bucket array -> 16-dim count vector
    "[len(list_filter({bks}, b -> b = i))::DOUBLE for i in range(0, 16)]"
)


@query(
    "x0_retrieval_pipeline",
    rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), c AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE ceil((len(toks) - 32)::DOUBLE / 24)::INT + 1 END
               AS n_chunks
      FROM t
    ), x AS (
      SELECT doc_id,
             unnest([{{'chunk_id': i - 1,
                      'chunk_text': array_to_string(
                        toks[(i-1)*24 + 1 : (i-1)*24 + 32], ' ')}}
                     for i in range(1, n_chunks + 1)]) AS ch
      FROM c
    ), eb AS (
      SELECT doc_id, ch.chunk_id::BIGINT AS chunk_id,
             {_FHB_SQL.format(col="ch.chunk_text")} AS bks
      FROM x
    ), emb AS (
      SELECT doc_id, chunk_id, {_FHV_SQL.format(bks="bks")} AS v FROM eb
    ), pb AS (
      SELECT {_FHB_SQL.format(col="text")} AS bks
      FROM documents WHERE doc_id = 0
    ), p AS (
      SELECT {_FHV_SQL.format(bks="bks")} AS pv FROM pb
    )
    SELECT doc_id, chunk_id,
           round(list_dot_product(v, pv) /
                 (sqrt(list_dot_product(v, v)) *
                  sqrt(list_dot_product(pv, pv))), 6) AS score
    FROM emb, p
    ORDER BY score DESC, doc_id, chunk_id LIMIT 10
    """,
)
def x0_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — the END-TO-END retrieval pipeline, one lazy plan: chunk
    (32/8) → embed every chunk (model-free feature hashing, so the
    whole composition carries a value-hash oracle) → cosine top-10
    against the query document's vector. Chunking and embedding are
    ONE narrow codegen stage over the scan; scoring folds into
    TakeOrderedAndProject — the corpus is never shuffled. Swap
    ``feature_hash_vector`` for learned embeddings and the plan shape
    is a production RAG indexer."""
    from vectordb_migrator_spark.functions.text import feature_hash_vector
    from vectordb_migrator_spark.functions.vector import cosine_similarity
    from vectordb_migrator_spark.operators.chunking import chunk_text
    from vectordb_migrator_spark.operators.similarity import probe_literal
    from vectordb_migrator_spark.operators.util import fan_out

    # fan_out: the toy corpus is one parquet file → one task; the
    # md5-per-token embed would single-thread without it (no-op on a
    # real multi-file corpus)
    docs = fan_out(_t(spark, sf_dir, "documents"))
    probe = [
        float(x)
        for x in docs.filter(F.col("doc_id") == 0)
        .select(feature_hash_vector("text", dim=16).alias("v"))
        .first()["v"]
    ]
    chunks = chunk_text(docs, chunk_size=32, overlap=8)
    scored = chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.round(
            cosine_similarity(
                feature_hash_vector("chunk_text", dim=16), probe_literal(probe)
            ),
            6,
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), "doc_id", "chunk_id").limit(10)


@query(
    "x0_training_manifest",
    r"""
    SELECT d.doc_id, d.source, d.lang,
           len(string_split_regex(lower(trim(d.text)), '\s+'))::BIGINT
             AS n_tok,
           e.label, len(e.embedding)::BIGINT AS dim,
           CASE
             WHEN CAST(CONCAT('0x', substr(md5(concat('split:', d.doc_id)),
                                           1, 8)) AS BIGINT)
                  / 4294967296.0 < 0.8 THEN 'train'
             WHEN CAST(CONCAT('0x', substr(md5(concat('split:', d.doc_id)),
                                           1, 8)) AS BIGINT)
                  / 4294967296.0 < 0.9 THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def x0_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — the assembled training manifest: text metadata joined to
    its embedding row plus a deterministic md5-coin 80/10/10 split —
    the frame a trainer actually consumes. One id-keyed join (at 100
    TB: bucket both tables on the id to make it exchange-free); the
    split is engine-reproducible, so the same row lands in the same
    split on every run and engine (full value-hash oracle)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    from vectordb_migrator_spark.functions.text import token_count_ws

    return (
        docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .select(
            "doc_id",
            "source",
            "lang",
            token_count_ws("text").cast("long").alias("n_tok"),
            "label",
            F.size("embedding").cast("long").alias("dim"),
            F.when(u < 0.8, "train")
            .when(u < 0.9, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


@query(
    "x2_minhash_md5_pairs",
    r"""
    WITH t AS (
      SELECT doc_id AS id,
             string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT id, list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks) - 1)]) AS g
      FROM t WHERE len(toks) >= 3
    ),
    sig AS (
      SELECT id,
             [list_min(list_transform(g,
                s -> CAST(CONCAT('0x', substr(md5(i::VARCHAR || ':' || s),
                                              1, 8)) AS BIGINT)))
              for i in range(0, 16)] AS s
      FROM sh
    ),
    bands AS (
      SELECT id,
             j::VARCHAR || '_' ||
             array_to_string(s[j*4+1 : j*4+4], '_') AS key
      FROM sig, unnest(range(0, 4)) b(j)
    ),
    c AS (SELECT key, count(*) AS n_bkt, min(id) AS anchor
          FROM bands GROUP BY key)
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bands a JOIN bands b ON a.key = b.key AND a.id < b.id
    JOIN c ON c.key = a.key
    WHERE c.n_bkt <= 50 OR a.id = c.anchor
    ORDER BY id_a, id_b
    """,
)
def x2_minhash_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — MinHash-LSH candidates with md5 hash functions: the
    engine-reproducible twin of x2_minhash_lsh_pairs, upgrading the
    MinHash family's correctness evidence from rows-only to a full
    value-hash oracle (16 hashes, 4 bands of 4, min-id star-cap 50).
    ``x2_minhash_estimate_error`` grades the estimator these
    candidates rely on."""
    from vectordb_migrator_spark.operators.dedup import minhash_md5_pairs

    return minhash_md5_pairs(
        _t(spark, sf_dir, "documents"),
        num_hashes=16,
        bands=4,
        max_bucket=50,
    ).orderBy("id_a", "id_b")


@query(
    "x2_minhash_estimate_error",
    r"""
    WITH t AS (
      SELECT doc_id AS id,
             string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT id, list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks) - 1)]) AS g
      FROM t WHERE len(toks) >= 3
    ),
    sig AS (
      SELECT id,
             [list_min(list_transform(g,
                s -> CAST(CONCAT('0x', substr(md5(i::VARCHAR || ':' || s),
                                              1, 8)) AS BIGINT)))
              for i in range(0, 16)] AS s
      FROM sh
    ),
    bands AS (
      SELECT id,
             j::VARCHAR || '_' ||
             array_to_string(s[j*4+1 : j*4+4], '_') AS key
      FROM sig, unnest(range(0, 4)) b(j)
    ),
    c AS (SELECT key, count(*) AS n_bkt, min(id) AS anchor
          FROM bands GROUP BY key),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b ON a.key = b.key AND a.id < b.id
      JOIN c ON c.key = a.key
      WHERE c.n_bkt <= 50 OR a.id = c.anchor
    ),
    est AS (
      SELECT cand.id_a, cand.id_b,
             round(len([i for i in range(1, 17)
                        if sa.s[i] = sb.s[i]]) / 16.0, 6) AS est
      FROM cand
      JOIN sig sa ON sa.id = cand.id_a
      JOIN sig sb ON sb.id = cand.id_b
    ),
    ex AS (
      SELECT id, len(g)::BIGINT AS n, unnest(g) AS gram FROM sh
    ),
    tr AS (
      SELECT cd.id_a, cd.id_b,
             round(count(*)::DOUBLE /
                   (any_value(a.n) + any_value(b.n) - count(*)), 6)
               AS true_j
      FROM cand cd
      JOIN ex a ON a.id = cd.id_a
      JOIN ex b ON b.id = cd.id_b AND b.gram = a.gram
      GROUP BY cd.id_a, cd.id_b
    ),
    p AS (
      SELECT round(floor(abs(est.est - tr.true_j) * 20) / 20, 2)
               AS err_lo,
             est.est, tr.true_j
      FROM est JOIN tr ON est.id_a = tr.id_a AND est.id_b = tr.id_b
    )
    SELECT err_lo, count(*)::BIGINT AS n_pairs,
           round(sum(est::DECIMAL(9,6))::DOUBLE / count(*), 6) AS avg_est,
           round(sum(true_j::DECIMAL(9,6))::DOUBLE / count(*), 6)
             AS avg_true
    FROM p GROUP BY err_lo ORDER BY err_lo
    """,
)
def x2_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — MinHash estimator-quality diagnostic (round 7; completes
    the tuning family next to the S-curve and threshold-sweep tables):
    for every LSH candidate pair, the 16-hash match-fraction Jaccard
    ESTIMATE vs the exact shingle-set Jaccard, rolled into 0.05-wide
    absolute-error buckets with exact DECIMAL-summed averages — the
    table that says whether 16 hashes are enough before a corpus run
    commits to them (σ = √(J(1−J)/k) ≈ 0.12 at k=16, so a heavy tail
    past 0.2 means raise k). Truth is computed ONLY for the
    candidate-sized pair set (a semi-join-bounded gram join), never
    all pairs. Full oracle (shared sig/candidate CTEs)."""
    from pyspark.sql import Window as W2

    from vectordb_migrator_spark.operators.dedup import (
        minhash_md5_signatures,
        shingles,
    )

    docs = _t(spark, sf_dir, "documents")
    # shared kernels materialize ONCE: the signature table (16
    # longs/doc) feeds BOTH the banded candidate generation and the
    # estimator, and the shingle table feeds the truth join — without
    # the checkpoints every branch re-tokenizes and re-hashes the
    # corpus (measured ~60s → ~5s at sf0.01 for the whole query)
    sigs = minhash_md5_signatures(docs, num_hashes=16).localCheckpoint(
        eager=True
    )
    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda j: F.concat_ws(
            "_",
            j.cast("string"),
            F.array_join(
                F.transform(
                    F.slice("sig", j * 4 + 1, 4), lambda x: x.cast("string")
                ),
                "_",
            ),
        ),
    )
    banded = sigs.select("id", F.explode(band_keys).alias("key"))
    w = W2.partitionBy("key")
    marked = banded.withColumn("n_bkt", F.count("*").over(w)).withColumn(
        "anchor", F.min("id").over(w)
    )
    cand = (
        marked.select("key", F.col("id").alias("id_a"), "n_bkt", "anchor")
        .join(banded.select("key", F.col("id").alias("id_b")), "key")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((F.col("n_bkt") <= 50) | (F.col("id_a") == F.col("anchor")))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sa"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sb"))
    est = cand.join(sa, "id_a").join(sb, "id_b").select(
        "id_a",
        "id_b",
        F.round(
            F.size(
                F.filter(
                    F.zip_with("sa", "sb", lambda x, y: x == y), lambda v: v
                )
            )
            / F.lit(16.0),
            6,
        ).alias("est"),
    )
    grams = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(shingles("text", 3))).alias("gram"),
    ).localCheckpoint(eager=True)
    nsz = grams.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ga = grams.join(
        cand.select(F.col("id_a").alias("id")).distinct(), "id", "left_semi"
    ).select(F.col("id").alias("id_a"), "gram")
    gb = grams.select(F.col("id").alias("id_b"), "gram")
    inter = (
        cand.join(ga, "id_a")
        .join(gb, ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("double").alias("inter"))
    )
    na = nsz.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    nb = nsz.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    true_j = (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("true_j"),
        )
    )
    p = est.join(true_j, ["id_a", "id_b"]).select(
        F.round(
            F.floor(F.abs(F.col("est") - F.col("true_j")) * 20) / 20, 2
        ).alias("err_lo"),
        "est",
        "true_j",
    )
    return (
        p.groupBy("err_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.col("est").cast("decimal(9,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_est"),
            F.round(
                F.sum(F.col("true_j").cast("decimal(9,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_true"),
        )
        .orderBy("err_lo")
    )


@query(
    "x10_kfold_assign",
    """
    SELECT doc_id,
           (CAST(CONCAT('0x', substr(md5(concat('fold:', doc_id)), 1, 8))
                 AS BIGINT) % 5)::BIGINT AS fold
    FROM documents ORDER BY doc_id
    """,
)
def x10_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — deterministic k-fold assignment for cross-validation:
    fold = md5(id) mod k, a pure function of the id — folds are
    stable across runs, partitionings, engines, and incremental
    re-runs (new rows never reshuffle old folds), and the whole
    assignment is value-hash-verified. Zero shuffles: one narrow
    projection."""
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", fold.alias("fold"))
        .orderBy("doc_id")
    )


@query(
    "x13_event_gaps",
    """
    WITH g AS (
      SELECT event_type,
             epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY event_type
                                              ORDER BY ts, event_id) AS gap_s
      FROM events WHERE ts IS NOT NULL
    )
    SELECT event_type,
           count(gap_s)::BIGINT AS n_gaps,
           round(avg(gap_s), 6) AS avg_gap_s,
           round(max(gap_s), 6) AS max_gap_s
    FROM g WHERE gap_s IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def x13_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — inter-arrival statistics per event type (mean/max gap
    seconds): the liveness/SLA diagnostic behind gap-based alerting.
    One exchange on the type key; the lag window sorts in-partition
    only (ties broken by event_id so the gap sequence is
    deterministic)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    sec = F.col("ts").cast("double")  # fractional seconds — exact micros
    gaps = ev.select(
        "event_type",
        (sec - F.lag(sec).over(w)).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_s").cast("long").alias("n_gaps"),
            F.round(F.avg("gap_s"), 6).alias("avg_gap_s"),
            F.round(F.max("gap_s"), 6).alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


@query(
    "x2_containment_pairs",
    r"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS g
      FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    ),
    ex AS (SELECT id, len(g)::BIGINT AS n, unnest(g) AS gram FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, a.n AS n_a, b.n AS n_b,
             count(*) AS common
      FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
      GROUP BY a.id, b.id, a.n, b.n
    )
    SELECT id_a, id_b,
           round(common / least(n_a, n_b)::DOUBLE, 6) AS containment
    FROM pairs
    WHERE common / least(n_a, n_b)::DOUBLE >= 0.5
    ORDER BY id_a, id_b
    """,
)
def x2_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — Broder CONTAINMENT pairs (|A∩B| / min(|A|,|B|)): the
    asymmetric companion to Jaccard — a short quote embedded in a
    long article scores ≈1 here while its Jaccard dilutes to ≈0.
    Same single-shuffle bucket machinery as the Jaccard pairs."""
    from vectordb_migrator_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5
    ).orderBy("id_a", "id_b")


@query(
    "x1_dup_rate_by_source",
    """
    SELECT source,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT md5(text))::BIGINT AS n_unique,
           round(1.0 - count(DISTINCT md5(text)) / count(*)::DOUBLE, 6)
             AS dup_rate
    FROM documents GROUP BY source ORDER BY source
    """,
)
def x1_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — duplication health by source: exact-duplicate rate per
    source from content fingerprints — the triage table that decides
    WHERE dedup effort goes before any pairwise work runs. One
    map-side-combinable aggregate; fingerprints, not text, feed the
    distinct."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct(F.md5("text")).cast("long").alias("n_unique"),
            F.round(
                1.0
                - F.countDistinct(F.md5("text"))
                / F.count("*").cast("double"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "x5_keywords",
    r"""
    WITH t AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> x != '')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
    df AS (SELECT tok, count(DISTINCT doc_id) AS dfv FROM t GROUP BY tok),
    nn AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM t),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.c * (ln((nn.n + 1) / (df.dfv + 1)) + 1), 6) AS tfidf
      FROM tf JOIN df USING (tok), nn
    )
    SELECT doc_id, tok, tfidf FROM (
      SELECT doc_id, tok, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok) AS rn
      FROM scored)
    WHERE rn <= 3 ORDER BY doc_id, tfidf DESC, tok
    """,
)
def x5_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — per-document keyword extraction: top-3 tokens by
    tf·idf(smoothed) — document tagging for search facets / topic
    routing. ONE (doc, token) count shuffle; the document-frequency
    table and doc count derive from the same exploded frame
    (ReuseExchange); per-doc top-3 via WindowGroupLimit — the
    (doc, token) frame never sorts globally."""
    from vectordb_migrator_spark.functions.text import ws_tokens
    from vectordb_migrator_spark.operators.util import fan_out

    toks = (
        fan_out(_t(spark, sf_dir, "documents"))
        .select("doc_id", F.explode(ws_tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    dfreq = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("dfv")
    )
    nn = toks.agg(F.countDistinct("doc_id").cast("double").alias("n"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("c") * (F.log((F.col("n") + 1) / (F.col("dfv") + 1)) + 1),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf")
        .orderBy("doc_id", F.desc("tfidf"), "tok")
    )


@query(
    "x9_storage_report",
    """
    WITH s AS (
      SELECT count(*)::BIGINT AS n,
             max(len(embedding))::BIGINT AS dim
      FROM embeddings
    )
    SELECT n, dim,
           (n * dim * 4)::BIGINT AS fp32_bytes,
           (n * dim)::BIGINT AS int8_bytes,
           (n * ceil(dim / 64.0) * 8)::BIGINT AS binary_bytes,
           (n * 8)::BIGINT AS pq8_bytes,
           round((n * dim * 4.0) / (n * dim), 2) AS int8_ratio,
           round((n * dim * 4.0) / (n * ceil(dim / 64.0) * 8), 2)
             AS binary_ratio,
           round((n * dim * 4.0) / (n * 8), 2) AS pq8_ratio
    FROM s
    """,
)
def x9_storage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — the quantization storage plan: corpus bytes under fp32 /
    int8-SQ / 1-bit binary / 8-subvector PQ codes, with compression
    ratios — the sizing table that decides which X4 retrieval family
    a deployment can afford to keep in memory. One tiny aggregate
    (count + dim), pure arithmetic after."""
    e = _t(spark, sf_dir, "embeddings")
    s = e.agg(
        F.count("*").cast("long").alias("n"),
        F.max(F.size("embedding")).cast("long").alias("dim"),
    )
    n, dim = F.col("n"), F.col("dim")
    binary_words = F.ceil(dim / 64.0)
    return s.select(
        "n",
        "dim",
        (n * dim * 4).cast("long").alias("fp32_bytes"),
        (n * dim).cast("long").alias("int8_bytes"),
        (n * binary_words * 8).cast("long").alias("binary_bytes"),
        (n * 8).cast("long").alias("pq8_bytes"),
        F.round((n * dim * 4.0) / (n * dim), 2).alias("int8_ratio"),
        F.round((n * dim * 4.0) / (n * binary_words * 8), 2).alias(
            "binary_ratio"
        ),
        F.round((n * dim * 4.0) / (n * 8), 2).alias("pq8_ratio"),
    )


@query(
    "x4_ivf_balance",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id < 8
    ),
    d AS (
      SELECT e.vec_id, c.cid,
             list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cv),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      FROM embeddings e, cent c
    ),
    a AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn FROM d)
      WHERE rn = 1
    ),
    per AS (SELECT cluster, count(*)::BIGINT AS n FROM a GROUP BY cluster),
    s AS (SELECT sum(n)::DOUBLE AS total, count(*)::DOUBLE AS k,
                 max(n)::BIGINT AS n_max, min(n)::BIGINT AS n_min
          FROM per)
    SELECT per.cluster::BIGINT AS cluster, per.n,
           round(per.n / s.total, 6) AS share,
           round(s.n_max / (s.total / s.k), 6) AS imbalance
    FROM per, s ORDER BY cluster
    """,
)
def x4_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — IVF partition-balance report (round 5): per-cluster row
    counts/shares plus the corpus imbalance factor (max cluster over
    mean) for a seeded-centroid assignment — the index health check
    behind the materialized-IVF layouts: a 10× imbalance means one
    probe partition does 10× the scan work and the layout needs
    refitting (same skew story as every bucket cap in the dedup
    family). Assignment is broadcast-nearest-centroid codegen; the
    report is one count shuffle + a broadcast 1-row stats frame."""
    from vectordb_migrator_spark.operators.clustering import assign_clusters

    e = _t(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < 8)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    per = (
        assign_clusters(e, cents)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    s = per.agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.max("n").cast("long").alias("n_max"),
    )
    return (
        per.crossJoin(F.broadcast(s))
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(F.col("n_max") / (F.col("total") / F.col("k")), 6).alias(
                "imbalance"
            ),
        )
        .orderBy("cluster")
    )


@query(
    "x5_lexical_diversity",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks)::BIGINT AS n_tok,
           len(list_distinct(toks))::BIGINT AS n_types,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE round(len(list_distinct(toks))::DOUBLE /
                           len(toks)::DOUBLE, 6) END AS ttr
    FROM t ORDER BY doc_id
    """,
)
def x5_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — type-token ratio (round 5): distinct tokens over total
    tokens per document — the lexical-diversity quality signal (a
    keyword-stuffed or template page has TTR near 0; natural prose sits
    much higher). Complements the repetition detector: repetition finds
    the worst offenders, TTR ranks the whole corpus. Pure codegen —
    tokenize, array_distinct, two sizes; zero shuffles."""
    from vectordb_migrator_spark.functions.text import ws_tokens

    toks = F.filter(ws_tokens("text"), lambda x: x != "")
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tok"),
            F.size(F.array_distinct("toks")).cast("long").alias("n_types"),
            F.when(F.size("toks") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.size(F.array_distinct("toks"))
                    / F.size("toks").cast("double"),
                    6,
                )
            )
            .alias("ttr"),
        )
        .orderBy("doc_id")
    )


@query(
    "x9_centroid_outliers",
    """
    WITH dims AS (
      SELECT e.label, r.i, avg(e.embedding[r.i]::DOUBLE) AS m
      FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) r(i)
      GROUP BY e.label, r.i
    ),
    cent AS (
      SELECT label, list(m ORDER BY i) AS cv FROM dims GROUP BY label
    ),
    d AS (
      SELECT e.vec_id, e.label,
             round(sqrt(list_sum(list_transform(
               list_zip(e.embedding::DOUBLE[], c.cv),
               p -> (p[1] - p[2]) * (p[1] - p[2])))), 6) AS dist
      FROM embeddings e JOIN cent c USING (label)
    ),
    cut AS (
      SELECT label, round(quantile_cont(dist, 0.95), 6) AS p95
      FROM d GROUP BY label
    )
    SELECT d.vec_id, d.label, d.dist, cut.p95
    FROM d JOIN cut USING (label)
    WHERE d.dist > cut.p95
    ORDER BY d.vec_id
    """,
)
def x9_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — per-label centroid-distance outliers (round 5): vectors
    unusually far from their own label's mean embedding (beyond the
    label's p95 distance) — the mislabel/noise screen an embedding
    corpus runs before training a classifier on it (the label-norm
    twin is vacuous here: fixture embeddings are unit-normalized).
    Centroids are ONE map-side-combinable per-(label, dim) aggregate;
    distances are a codegen fold against the broadcast centroid table;
    the per-label exact-percentile cut is a second tiny broadcast —
    the corpus scans twice (distance pass + flag pass share lineage)
    and never shuffles its vectors."""
    from vectordb_migrator_spark.operators.similarity import (
        ivf_build_centroids,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents = ivf_build_centroids(e, cluster_col="label", vec_col="embedding")
    d = (
        e.join(
            F.broadcast(cents.withColumnRenamed("cluster", "label")), "label"
        )
        .select(
            "vec_id",
            "label",
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.zip_with(
                            F.col("embedding").cast("array<double>"),
                            F.col("centroid"),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda s, x: s + x,
                    )
                ),
                6,
            ).alias("dist"),
        )
    )
    cut = d.groupBy("label").agg(
        F.round(F.percentile("dist", F.lit(0.95)), 6).alias("p95")
    )
    return (
        d.join(F.broadcast(cut), "label")
        .filter(F.col("dist") > F.col("p95"))
        .select("vec_id", "label", "dist", "p95")
        .orderBy("vec_id")
    )


@query(
    "x9_sq_error_by_label",
    """
    WITH q AS (
      SELECT label, embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
               AS scale
      FROM embeddings
    ),
    m AS (
      SELECT label,
             CASE WHEN scale = 0 THEN 0.0 ELSE
               list_sum([(v[i] - round(v[i] / scale) * scale) *
                         (v[i] - round(v[i] / scale) * scale)
                         for i in range(1, len(v) + 1)]) / len(v) END AS mse
      FROM q
    )
    SELECT label, count(*)::BIGINT AS n,
           round(avg(mse), 6) AS mse_mean,
           round(max(mse), 6) AS mse_max
    FROM m GROUP BY label ORDER BY label
    """,
)
def x9_sq_error_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — int8-SQ reconstruction-error report by label (round 5): the
    quality half of the storage plan — ``x9_storage_report`` says int8
    costs 4× less; this says what the 4× costs in mean/max per-dim
    squared error, per label (a skewed-magnitude label quantizes
    worse — symmetric SQ spends its range on the largest coordinate).
    Per-row error is one codegen fold over the vector; the report is
    one map-side-combinable label aggregate."""
    from vectordb_migrator_spark.functions.vector import (
        int8_dequantize,
        int8_quantize,
    )

    e = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    rec = int8_dequantize(int8_quantize("embedding"))
    mse = F.aggregate(
        F.zip_with(v, rec, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda s, x: s + x,
    ) / F.size(v)
    return (
        e.select("label", mse.alias("mse"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("mse"), 6).alias("mse_mean"),
            F.round(F.max("mse"), 6).alias("mse_max"),
        )
        .orderBy("label")
    )


@query(
    "x5_quality_tiers",
    r"""
    WITH s AS (
      SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT
               AS n_tok
      FROM documents
    ),
    t AS (
      SELECT doc_id, n_tok,
             ntile(10) OVER (ORDER BY n_tok DESC, doc_id) AS tier
      FROM s
    )
    SELECT tier::INT AS tier, count(*)::BIGINT AS n,
           min(n_tok) AS tok_min, max(n_tok) AS tok_max,
           round(avg(n_tok), 6) AS tok_mean
    FROM t GROUP BY tier ORDER BY tier
    """,
)
def x5_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — quality-decile tiers (round 5): rank the corpus into ntile
    deciles on a quality signal (token count here; any classifier score
    plugs in) and report per-tier stats — the frame behind "train on
    the top 3 deciles" curation decisions. The tie-break includes the
    id, so tiles are deterministic across engines. ONE global ntile is
    the honest cost (a total order); at 100 TB you'd approximate the
    decile CUTS from approx-percentiles instead — this report is the
    exact small-N variant."""
    from pyspark.sql import Window as W

    from vectordb_migrator_spark.functions.text import token_count_ws

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").cast("long").alias("n_tok")
    )
    t = docs.withColumn(
        "tier", F.ntile(10).over(W.orderBy(F.desc("n_tok"), "doc_id"))
    )
    return (
        t.groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("n_tok").alias("tok_min"),
            F.max("n_tok").alias("tok_max"),
            F.round(F.avg("n_tok"), 6).alias("tok_mean"),
        )
        .orderBy("tier")
    )


@query(
    "x10_token_budget_cap",
    r"""
    WITH m AS (
      SELECT doc_id, source,
             len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT
               AS n_tok,
             CAST(CONCAT('0x', substr(md5(concat('cap:', doc_id)), 1, 15))
                  AS BIGINT) AS key
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY key, doc_id)
               ::BIGINT AS cum
      FROM m
    )
    SELECT doc_id, source, n_tok, cum
    FROM r WHERE cum <= 800
    ORDER BY doc_id
    """,
)
def x10_token_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — per-source token-budget cap (round 5): each source
    contributes at most B=800 tokens, chosen by a DETERMINISTIC
    pseudo-random order (md5 key) + running token cumsum — the "no
    single source dominates" guard a mixture plan enforces as a hard
    ceiling, reproducible across runs and engines (the same docs make
    the cut every time; rand() ordering would resample every run).
    One window per source (key-local exchange), cumsum in codegen —
    the sessionization shape."""
    from pyspark.sql import Window as W

    from vectordb_migrator_spark.functions.text import token_count_ws

    docs = _t(spark, sf_dir, "documents")
    key = F.conv(
        F.substring(F.md5(F.concat(F.lit("cap:"), F.col("doc_id"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    m = docs.select(
        "doc_id",
        "source",
        token_count_ws("text").cast("long").alias("n_tok"),
        key.alias("__key"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("__key", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        m.withColumn("cum", F.sum("n_tok").over(w).cast("long"))
        .filter(F.col("cum") <= 800)
        .select("doc_id", "source", "n_tok", "cum")
        .orderBy("doc_id")
    )


@query(
    "x0_doc_packing",
    r"""
    WITH m AS (
      SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT
               AS n_tok,
             CAST(CONCAT('0x', substr(md5(concat('shuffle:0:', doc_id)),
                                      1, 15)) AS BIGINT) AS key
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_tok, key, (((key % 8) + 8) % 8)::INT AS shard FROM m
    ),
    r AS (
      SELECT doc_id, n_tok, shard,
             sum(n_tok) OVER (PARTITION BY shard ORDER BY key, doc_id)
               - n_tok AS off
      FROM s
    )
    SELECT doc_id, shard,
           (off // 512)::BIGINT AS seq_id,
           (off % 512)::BIGINT AS seq_offset,
           n_tok
    FROM r ORDER BY doc_id
    """,
)
def x0_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — cross-document sequence packing (round 5): WHOLE documents
    fill fixed 512-token training sequences in deterministic-shuffle
    order (the md5 key both shuffles and shards) — the
    concatenate-and-chunk recipe every LM pretraining pipeline runs,
    with the same contiguous-offset semantics as ``pack_chunks`` (a
    sequence may overflow by one doc; the trainer truncates). The
    shard axis bounds the window partition so packing parallelizes at
    corpus scale; within a shard it is the sessionization shape (one
    exchange, codegen cumsum). Reproducible: same corpus + seed →
    byte-identical sequence layout."""
    from pyspark.sql import Window as W

    from vectordb_migrator_spark.functions.text import token_count_ws
    from vectordb_migrator_spark.operators.scale import deterministic_shuffle

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").cast("long").alias("n_tok")
    )
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shuffle:0:"), F.col("doc_id"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    s = docs.withColumn("__key", key).withColumn(
        "shard", F.pmod(F.col("__key"), F.lit(8)).cast("int")
    )
    w = (
        W.partitionBy("shard")
        .orderBy("__key", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    off = F.sum("n_tok").over(w) - F.col("n_tok")
    return (
        s.withColumn("off", off)
        .select(
            "doc_id",
            "shard",
            F.floor(F.col("off") / 512).cast("long").alias("seq_id"),
            (F.col("off") % 512).cast("long").alias("seq_offset"),
            "n_tok",
        )
        .orderBy("doc_id")
    )


def x0_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — sequence-length bucketing economics (round 7): the OTHER
    batching strategy next to ``x0_doc_packing``'s concatenation —
    for finetuning/inference where documents stay separate, docs pad
    to their power-of-two length bucket (32..1024, longer truncates to
    1024) and the table prices each bucket: docs, real tokens, padding
    tokens, padding share, truncated tokens. The padding share is the
    compute a trainer burns on pad tokens per bucket — the number that
    justifies bucketed batching over pad-to-max. ONE map-side
    combinable aggregate over the corpus; bucket assignment is a
    codegen CASE ladder. Full oracle."""
    from vectordb_migrator_spark.functions.text import token_count_ws

    n = token_count_ws("text").cast("long")
    eff = F.least(n, F.lit(1024))
    edge = (
        F.when(eff <= 32, 32)
        .when(eff <= 64, 64)
        .when(eff <= 128, 128)
        .when(eff <= 256, 256)
        .when(eff <= 512, 512)
        .otherwise(1024)
        .cast("long")
    )
    d = _t(spark, sf_dir, "documents").select(
        edge.alias("bucket"),
        eff.alias("eff"),
        (n - eff).alias("trunc"),
    )
    return (
        d.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("eff").cast("long").alias("tokens"),
            (F.first("bucket") * F.count(F.lit(1)) - F.sum("eff"))
            .cast("long")
            .alias("pad_tokens"),
            F.round(
                (F.first("bucket") * F.count(F.lit(1)) - F.sum("eff"))
                / (F.first("bucket") * F.count(F.lit(1))),
                6,
            ).alias("pad_share"),
            F.sum("trunc").cast("long").alias("trunc_tokens"),
        )
        .orderBy("bucket")
    )


ORACLES["x0_length_buckets"] = r"""
    WITH d AS (
      SELECT len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT AS n
      FROM documents
    ), b AS (
      SELECT least(n, 1024) AS eff, n - least(n, 1024) AS trunc,
             (CASE WHEN least(n, 1024) <= 32 THEN 32
                   WHEN least(n, 1024) <= 64 THEN 64
                   WHEN least(n, 1024) <= 128 THEN 128
                   WHEN least(n, 1024) <= 256 THEN 256
                   WHEN least(n, 1024) <= 512 THEN 512
                   ELSE 1024 END)::BIGINT AS bucket
      FROM d
    )
    SELECT bucket, count(*)::BIGINT AS docs, sum(eff)::BIGINT AS tokens,
           (bucket * count(*) - sum(eff))::BIGINT AS pad_tokens,
           round((bucket * count(*) - sum(eff))::DOUBLE
                 / (bucket * count(*)), 6) AS pad_share,
           sum(trunc)::BIGINT AS trunc_tokens
    FROM b GROUP BY bucket ORDER BY bucket
"""
QUERIES["x0_length_buckets"] = x0_length_buckets


def _tier_case_sql(n: int = 10) -> str:
    whens = " ".join(
        f"WHEN n_tok <= bs[{i}] THEN {i}" for i in range(1, n)
    )
    return f"CASE {whens} ELSE {n} END"


@query(
    "x5_quality_tiers_scalable",
    rf"""
    WITH s AS (
      SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT
               AS n_tok
      FROM documents
    ),
    b AS (
      SELECT quantile_cont(n_tok,
               [{", ".join(str((i + 1) / 10) for i in range(9))}]) AS bs
      FROM s
    ),
    t AS (
      SELECT doc_id, n_tok, {_tier_case_sql(10)} AS tier
      FROM s, b
    )
    SELECT tier::INT AS tier, count(*)::BIGINT AS n,
           min(n_tok) AS tok_min, max(n_tok) AS tok_max,
           round(avg(n_tok), 6) AS tok_mean
    FROM t GROUP BY tier ORDER BY tier
    """,
)
def x5_quality_tiers_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — quality deciles, the 100 TB path (round 5): instead of
    ``x5_quality_tiers``'s global ntile sort, the nine decile CUTS
    reduce to ONE exact-percentile aggregate row broadcast back into
    the scan — the corpus never sorts and never shuffles (same
    machinery as ``equal_frequency_bins``). Bin populations can deviate
    from exact tenths when many rows tie at a cut — the price of not
    sorting, and the correct trade at scale; the ntile twin quantifies
    the difference at small N."""
    from vectordb_migrator_spark.functions.text import token_count_ws
    from vectordb_migrator_spark.operators.slicing import equal_frequency_bins

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").cast("long").alias("n_tok")
    )
    binned = equal_frequency_bins(
        docs,
        value_col="n_tok",
        probs=tuple((i + 1) / 10 for i in range(9)),
        bin_col="tier",
    )
    return (
        binned.groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("n_tok").alias("tok_min"),
            F.max("n_tok").alias("tok_max"),
            F.round(F.avg("n_tok"), 6).alias("tok_mean"),
        )
        .select(F.col("tier").cast("int").alias("tier"), "n",
                "tok_min", "tok_max", "tok_mean")
        .orderBy("tier")
    )


@query(
    "x3_training_triples",
    """
    WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.q_id, q.q_label, e.vec_id AS c_id, e.label AS c_label,
             round(list_dot_product(e.embedding::DOUBLE[], q.qv) /
                   (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
      FROM embeddings e, q
      WHERE e.vec_id != q.q_id
    ),
    pos AS (
      SELECT q_id, c_id AS pos_id, score AS pos_score FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY score DESC, c_id) AS rn
        FROM scored WHERE c_label = q_label) WHERE rn = 1
    ),
    neg AS (
      SELECT q_id, c_id AS neg_id, score AS neg_score FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY score DESC, c_id) AS rn
        FROM scored WHERE c_label != q_label) WHERE rn = 1
    )
    SELECT q_id AS anchor_id, pos_id, pos_score, neg_id, neg_score,
           round(pos_score - neg_score, 6) AS margin
    FROM pos JOIN neg USING (q_id)
    ORDER BY anchor_id
    """,
)
def x3_training_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — contrastive training triples: per anchor, the nearest
    SAME-label row (positive) and the nearest DIFFERENT-label row
    (hard negative) plus the margin between them — the (a, p, n)
    frame a triplet/InfoNCE trainer consumes. ONE broadcast of the
    anchor side scores the corpus ONCE; ranking runs as a single
    window partitioned by (q_id, is_positive) — separate pos/neg
    branches would re-scan and re-score the corpus (Catalyst cannot
    reuse a subtree under two different filters), which this shape
    avoids by making the side a partition key instead of a filter.
    The WindowGroupLimit rewrite keeps only each partition's top row
    pre-shuffle."""
    from vectordb_migrator_spark.functions.vector import cosine_similarity

    e = _t(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    corpus = e.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_vec"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            (F.col("c_label") == F.col("q_label")).alias("is_pos"),
            F.round(cosine_similarity("q_vec", "c_vec"), 6).alias("score"),
        )
    )
    w = W.partitionBy("q_id", "is_pos").orderBy(F.desc("score"), "c_id")
    top = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        top.groupBy("q_id")
        .agg(
            F.max(F.when(F.col("is_pos"), F.col("c_id"))).alias("pos_id"),
            F.max(F.when(F.col("is_pos"), F.col("score"))).alias("pos_score"),
            F.max(F.when(~F.col("is_pos"), F.col("c_id"))).alias("neg_id"),
            F.max(F.when(~F.col("is_pos"), F.col("score"))).alias("neg_score"),
        )
        .filter(F.col("pos_id").isNotNull() & F.col("neg_id").isNotNull())
        .select(
            F.col("q_id").alias("anchor_id"),
            "pos_id",
            "pos_score",
            "neg_id",
            "neg_score",
            F.round(F.col("pos_score") - F.col("neg_score"), 6).alias("margin"),
        )
        .orderBy("anchor_id")
    )


@query(
    "x10_stratified_weighted",
    r"""
    WITH keyed AS (
      SELECT doc_id, source,
             len(string_split_regex(lower(trim(text)), '\s+'))::DOUBLE
               AS n_tok,
             round(pow(
               (CAST(CONCAT('0x', substr(md5(doc_id::VARCHAR || ':11'),
                                         1, 8)) AS BIGINT) + 0.5)
                 / 4294967296.0,
               1.0 / (len(string_split_regex(lower(trim(text)),
                                             '\s+'))::DOUBLE / 50.0)),
               9) AS key
      FROM documents
    )
    SELECT doc_id, source, n_tok::BIGINT AS n_tok FROM (
      SELECT doc_id, source, n_tok,
             row_number() OVER (PARTITION BY source
                                ORDER BY key DESC, doc_id) AS rn
      FROM keyed)
    WHERE rn <= 3 ORDER BY doc_id
    """,
)
def x10_stratified_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — per-source weighted quota: 3 docs per source drawn A-ES
    with token-count weights and the md5 coin — the per-stratum
    version of weighted sampling (draw k good docs per language/
    source/topic). One group-key exchange + per-group window top-k;
    whole draw value-hash-verified."""
    from vectordb_migrator_spark.functions.text import token_count_ws
    from vectordb_migrator_spark.operators.slicing import (
        stratified_weighted_sample,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "w", token_count_ws("text").cast("double") / 50.0
    )
    return (
        stratified_weighted_sample(
            docs,
            group_col="source",
            weight_col="w",
            k=3,
            id_col="doc_id",
            seed=11,
        )
        .select(
            "doc_id",
            "source",
            token_count_ws("text").cast("long").alias("n_tok"),
        )
        .orderBy("doc_id")
    )


@query(
    "x10_weighted_md5_sample",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM (
      SELECT o_orderkey, o_totalprice,
             round(pow(
               (CAST(CONCAT('0x', substr(md5(o_orderkey::VARCHAR || ':7'),
                                         1, 8)) AS BIGINT) + 0.5)
                 / 4294967296.0,
               1.0 / (o_totalprice / 100000.0)), 9) AS key
      FROM orders WHERE o_totalprice > 0)
    ORDER BY key DESC, o_orderkey LIMIT 50
    """,
)
def x10_weighted_md5_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — A-ES weighted sampling with the md5 coin: the
    engine-reproducible twin of x10_weighted_sample (whose xxhash64
    keys are JVM-only, hence rows-only checkable). Inclusion odds
    proportional to order price; one scan, heap top-k, and the exact
    50-row sample value-hash matches DuckDB."""
    from vectordb_migrator_spark.operators.slicing import weighted_sample

    orders = _t(spark, sf_dir, "orders").withColumn(
        "w", F.col("o_totalprice") / 100000.0
    )
    return weighted_sample(
        orders, weight_col="w", k=50, id_col="o_orderkey", seed=7, coin="md5"
    ).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )


@query(
    "x2_simhash_md5_pairs",
    r"""
    WITH t AS (
      SELECT doc_id AS id,
             list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS g
      FROM documents
    ),
    bits AS (
      SELECT id,
        [CASE WHEN list_sum(list_transform(g, tk ->
            CASE WHEN (CASE WHEN i >= 32
                            THEN CAST(CONCAT('0x', substr(md5(tk), 1, 8))
                                 AS BIGINT)
                            ELSE CAST(CONCAT('0x', substr(md5(tk), 9, 8))
                                 AS BIGINT) END
                       & (1::BIGINT << (i % 32))) != 0
                 THEN 1 ELSE -1 END)) > 0
         THEN 1::BIGINT ELSE 0::BIGINT END
         for i in range(0, 64)] AS bv
      FROM t
    ),
    sig AS (
      SELECT id,
             list_sum([bv[i+1] * (1::BIGINT << i)
                       for i in range(0, 32)])::BIGINT AS sig_lo,
             list_sum([bv[i+33] * (1::BIGINT << i)
                       for i in range(0, 32)])::BIGINT AS sig_hi
      FROM bits
    ),
    bands AS (
      SELECT id, sig_lo, sig_hi,
             j::VARCHAR || '_' ||
             (CASE j WHEN 0 THEN sig_lo & 65535
                     WHEN 1 THEN (sig_lo >> 16) & 65535
                     WHEN 2 THEN sig_hi & 65535
                     ELSE (sig_hi >> 16) & 65535 END)::VARCHAR AS key
      FROM sig, unnest(range(0, 4)) b(j)
    ),
    c AS (SELECT key, count(*) AS n_bkt, min(id) AS anchor
          FROM bands GROUP BY key)
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           (bit_count(xor(a.sig_lo, b.sig_lo)) +
            bit_count(xor(a.sig_hi, b.sig_hi)))::BIGINT AS hamming
    FROM bands a JOIN bands b ON a.key = b.key AND a.id < b.id
    JOIN c ON c.key = a.key
    WHERE (c.n_bkt <= 50 OR a.id = c.anchor)
      AND bit_count(xor(a.sig_lo, b.sig_lo)) +
          bit_count(xor(a.sig_hi, b.sig_hi)) <= 12
    ORDER BY id_a, id_b
    """,
)
def x2_simhash_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — SimHash near-dup pairs with md5 token hashes: the
    engine-reproducible twin of x2_simhash_pairs, upgrading the
    SimHash family to a full value-hash oracle (16-bit banding,
    Hamming ≤ 12 verify, min-id star-cap 50)."""
    from vectordb_migrator_spark.operators.dedup import simhash_md5_pairs

    return simhash_md5_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=12, max_bucket=50
    ).orderBy("id_a", "id_b")


@query(
    "x13_user_features",
    """
    SELECT event_id, user_id,
           count(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                AND CURRENT ROW)::BIGINT AS n_1h,
           count(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                                AND CURRENT ROW)::BIGINT AS n_24h,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                                AND CURRENT ROW), 6) AS v_24h
    FROM events
    ORDER BY event_id
    """,
)
def x13_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — point-in-time sliding features (the feature-store shape):
    per event, that user's activity count over the trailing 1h/24h and
    value sum over 24h — range frames anchored at the event itself, so
    every feature is leak-free (uses only what was known at event
    time). One exchange on user_id; per-user windows are safe here
    because user cardinality is high (no hot-key funnel — contrast
    the broadcast-stats pattern used for the LOW-cardinality
    event_type keys in zscore_anomalies)."""
    ev = _t(spark, sf_dir, "events")
    ts_s = F.col("ts").cast("long")
    w1 = (
        W.partitionBy("user_id").orderBy(ts_s).rangeBetween(-3600, 0)
    )
    w24 = (
        W.partitionBy("user_id").orderBy(ts_s).rangeBetween(-86400, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w1).cast("long").alias("n_1h"),
        F.count("*").over(w24).cast("long").alias("n_24h"),
        F.round(F.sum("value").over(w24), 6).alias("v_24h"),
    ).orderBy("event_id")


@query(
    "x5_distinctive_terms",
    r"""
    WITH t AS (
      SELECT source, unnest(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> x != '')) AS tok
      FROM documents
    ),
    st AS (SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok),
    s AS (SELECT source, sum(c) AS n_src FROM st GROUP BY source),
    ct AS (SELECT tok, sum(c) AS cc FROM st GROUP BY tok),
    tot AS (SELECT sum(cc) AS n_all FROM ct),
    lifted AS (
      SELECT st.source, st.tok,
             round(log2((st.c / s.n_src) / (ct.cc / tot.n_all)), 6) AS lift
      FROM st
      JOIN s USING (source)
      JOIN ct USING (tok), tot
      WHERE ct.cc >= 10
    )
    SELECT * FROM (
      SELECT source, tok, lift,
             row_number() OVER (PARTITION BY source
                                ORDER BY lift DESC, tok)::BIGINT AS rank
      FROM lifted)
    WHERE rank <= 5 ORDER BY source, rank
    """,
)
def x5_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — per-source distinctive vocabulary: top-5 tokens by log2
    lift of in-source frequency over corpus frequency (min corpus
    count 10) — the corpus-comparison diagnostic behind 'what is this
    source actually made of'. ONE (source, token) count shuffle; the
    source totals, corpus token totals, and grand total all derive
    from that frame (ReuseExchange); per-source top-5 is a window over
    source partitions."""
    docs = _t(spark, sf_dir, "documents")
    from vectordb_migrator_spark.functions.text import ws_tokens
    from vectordb_migrator_spark.operators.util import fan_out

    toks = (
        fan_out(docs)
        .select("source", F.explode(ws_tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    s = st.groupBy("source").agg(F.sum("c").alias("n_src"))
    ct = st.groupBy("tok").agg(F.sum("c").alias("cc"))
    tot = ct.agg(F.sum("cc").alias("n_all"))
    lifted = (
        st.join(F.broadcast(s), "source")
        .join(ct.filter(F.col("cc") >= 10), "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tok",
            F.round(
                F.log2(
                    (F.col("c") / F.col("n_src"))
                    / (F.col("cc") / F.col("n_all"))
                ),
                6,
            ).alias("lift"),
        )
    )
    w = W.partitionBy("source").orderBy(F.desc("lift"), "tok")
    return (
        lifted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .orderBy("source", "rank")
    )


@query(
    "x13_changepoints",
    """
    WITH d AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             round(avg(value), 6) AS v
      FROM events GROUP BY 1
    ),
    s AS (SELECT avg(v) AS mu, stddev_pop(v) AS sd FROM d),
    c AS (
      SELECT day, v,
             round(sum((v - mu) / sd) OVER (ORDER BY day), 6) AS cusum
      FROM d, s
    ),
    r AS (
      SELECT day, v, cusum,
             row_number() OVER (ORDER BY abs(cusum) DESC, day) AS rk
      FROM c
    )
    SELECT day, v, cusum,
           (CASE WHEN rk = 1 THEN 1 ELSE 0 END)::BIGINT AS is_peak,
           (CASE WHEN abs(cusum) > 3.0 THEN 1 ELSE 0 END)::BIGINT
             AS exceeds
    FROM r ORDER BY day
    """,
)
def x13_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — CUSUM mean-shift changepoint detection (round 7): the
    standardized cumulative deviation of the daily event-value mean
    (Page 1954); the |CUSUM| peak marks the most likely shift day, an
    excursion past 3 flags that a level shift happened — the
    data-drift alarm a 100 TB ingest pipeline runs on every source.
    ONE map-side-combined daily aggregate touches the log; every
    window then runs on the day-sized frame (the STL/EWMA shape).
    Cumulative sums run in day order in both engines, so round-6 makes
    the statistic engine-exact. Full oracle."""
    from vectordb_migrator_spark.operators.timeseries import (
        cusum_changepoints,
    )

    return cusum_changepoints(
        _t(spark, sf_dir, "events"), threshold=3.0
    )


@query(
    "x13_stl_decompose",
    r"""
    WITH daily AS (
      SELECT ts::DATE AS day, round(sum(value), 6) AS v
      FROM events GROUP BY ts::DATE
    ),
    tr AS (
      SELECT day, v,
             round(avg(v) OVER (ORDER BY day
                                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING),
                   6) AS trend
      FROM daily
    ),
    det AS (
      SELECT day, v, trend, v - trend AS detr,
             ((day - DATE '1970-01-01') % 7)::INT AS dow
      FROM tr
    ),
    seas AS (
      SELECT dow, round(avg(detr), 6) AS seasonal FROM det GROUP BY dow
    )
    SELECT d.day, d.v, d.trend, s.seasonal,
           round(d.v - d.trend - s.seasonal, 6) AS resid
    FROM det d JOIN seas s USING (dow)
    ORDER BY d.day
    """,
)
def x13_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — STL-lite seasonal decomposition (round 6): the daily
    value series split into trend (centered 7-day moving average;
    edge windows are the same partial means in both engines, so no
    null fencing), weekly seasonal (per day-of-week mean of the
    detrended series — the portable dow is days-since-epoch mod 7,
    sidestepping Spark's 1-based vs DuckDB's 0-based ``dayofweek``),
    and residual — the classic decomposition behind every
    "is this drop seasonal or real" question, feeding the
    ``x13_seasonal_anomalies`` z-score gate with an explainable
    model. Scale shape: the series is already one row per day (the
    daily aggregate is the only corpus-sized pass), so the windows
    run on a year-of-days frame — thousands of rows however big the
    event log."""
    from pyspark.sql import Window as W

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    w = W.orderBy("day").rowsBetween(-3, 3)
    det = daily.select(
        "day",
        "v",
        F.round(F.avg("v").over(w), 6).alias("trend"),
    ).withColumn("detr", F.col("v") - F.col("trend")).withColumn(
        "dow",
        (F.datediff("day", F.lit("1970-01-01")) % 7).cast("int"),
    )
    seas = det.groupBy("dow").agg(
        F.round(F.avg("detr"), 6).alias("seasonal")
    )
    return (
        det.join(seas, "dow")
        .select(
            "day",
            "v",
            "trend",
            "seasonal",
            F.round(
                F.col("v") - F.col("trend") - F.col("seasonal"), 6
            ).alias("resid"),
        )
        .orderBy("day")
    )


@query(
    "x13_kaplan_meier",
    """
    WITH b AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid,
                      max(CASE WHEN epoch(ts) <=
                            (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2
                             FROM events)
                          THEN ts END) AS wend
               FROM events),
    w AS (SELECT user_id, ts, event_type, value FROM events, b
          WHERE epoch(ts) <= b.mid AND user_id IS NOT NULL),
    per AS (SELECT user_id, min(ts) AS fs,
                   min(CASE WHEN event_type = 'purchase'
                             AND value > 97 THEN ts END) AS fe
            FROM w GROUP BY 1),
    u AS (SELECT date_diff('day', fs,
                           coalesce(fe, b.wend))::DOUBLE AS t,
                 CASE WHEN fe IS NOT NULL THEN 1 ELSE 0 END AS ev
          FROM per, b),
    per2 AS (SELECT t, sum(ev)::BIGINT AS d,
                    sum(1 - ev)::BIGINT AS c
             FROM u GROUP BY t),
    r AS (SELECT t, d, c,
                 sum(d + c) OVER (ORDER BY t DESC
                                  ROWS UNBOUNDED PRECEDING) AS n
          FROM per2),
    s AS (SELECT t, d, c, n,
                 CASE WHEN d > 0 AND d < n
                        THEN ln(1 - d::DOUBLE / n)
                      WHEN d = 0 THEN 0.0 ELSE NULL END AS lg,
                 max(CASE WHEN d = n THEN 1 ELSE 0 END)
                   OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS z
          FROM r),
    f AS (SELECT t, n, d, c, z,
                 sum(lg) OVER (ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS ls
          FROM s)
    SELECT t, n::BIGINT AS n_at_risk, d AS n_events, c AS n_censored,
           round(CASE WHEN z = 1 THEN 0.0 ELSE exp(ls) END, 6)
             AS survival
    FROM f WHERE d > 0 ORDER BY t
    """,
)
def x13_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — Kaplan–Meier time-to-conversion curve (round 7):
    observing only the log's FIRST time half (administrative
    censoring at the analysis date), each user's duration runs from
    their first event to their first high-value purchase
    (value > 97); users with none by the window's end are
    right-CENSORED at the window edge — the product-limit estimator
    is the statistically honest conversion/retention curve when
    observation windows differ (the naive "fraction converted by t"
    silently treats censored users as failures). One grouped pass
    folds the log to per-user durations, a second to one row per
    DISTINCT duration; the risk set is a reversed cumulative sum and
    Ŝ(t) = exp(Σ ln(1−dᵢ/nᵢ)) windows over that tiny frame
    (operators/timeseries.py:kaplan_meier). Full oracle."""
    from vectordb_migrator_spark.operators.timeseries import kaplan_meier

    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    b = _t(spark, sf_dir, "events").agg(
        (
            (F.min(F.col("ts").cast("double"))
             + F.max(F.col("ts").cast("double"))) / 2
        ).alias("mid")
    )
    w = ev.crossJoin(F.broadcast(b)).filter(
        F.col("ts").cast("double") <= F.col("mid")
    )
    wend = w.agg(F.max("ts").alias("wend"))
    hit = (F.col("event_type") == "purchase") & (F.col("value") > 97)
    per = w.groupBy("user_id").agg(
        F.min("ts").alias("fs"),
        F.min(F.when(hit, F.col("ts"))).alias("fe"),
    )
    units = per.crossJoin(F.broadcast(wend)).select(
        F.datediff(F.coalesce("fe", "wend"), "fs")
        .cast("double")
        .alias("dur"),
        F.col("fe").isNotNull().cast("int").alias("ev"),
    )
    return kaplan_meier(units, duration_col="dur", event_col="ev")


@query(
    "x13_attribution",
    """
    WITH conv AS (
      SELECT user_id, ts AS cts, event_id AS cid FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ),
    t AS (
      SELECT user_id, ts AS tts, event_type AS touch_type,
             event_id AS tid
      FROM events
      WHERE event_type IN ('view', 'click', 'signup')
        AND user_id IS NOT NULL
    ),
    pairs AS (
      SELECT c.cid, t.touch_type, t.tts, t.tid
      FROM conv c JOIN t USING (user_id)
      WHERE t.tts <= c.cts
        AND epoch(t.tts) > epoch(c.cts) - 604800
    ),
    r AS (
      SELECT cid, touch_type,
             row_number() OVER (PARTITION BY cid
                                ORDER BY tts DESC, tid DESC) AS rl,
             row_number() OVER (PARTITION BY cid
                                ORDER BY tts, tid) AS rf,
             count(*) OVER (PARTITION BY cid) AS k
      FROM pairs
    ),
    m AS (
      SELECT touch_type, 'first_touch' AS model,
             (CASE WHEN rf = 1 THEN 1.0 ELSE 0.0 END)::DOUBLE AS credit
      FROM r
      UNION ALL
      SELECT touch_type, 'last_touch',
             (CASE WHEN rl = 1 THEN 1.0 ELSE 0.0 END)::DOUBLE
      FROM r
      UNION ALL
      SELECT touch_type, 'linear', 1.0::DOUBLE / k FROM r
    )
    SELECT model, touch_type, round(sum(credit), 6) AS credited
    FROM m GROUP BY 1, 2 ORDER BY model, touch_type
    """,
)
def x13_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — multi-touch conversion attribution (round 7): every
    purchase credits the user's view/click/signup touches of the
    preceding 7 days under last-touch, first-touch, and linear models
    simultaneously — the product-analytics question "which
    interaction drives purchases", answered three ways so the models'
    disagreement (the funnel's shape) is itself visible. ONE unit-key
    equi-join pays for all three models; ranks are per-conversion
    windows (operators/relational.py:attribution_credits). Full
    oracle."""
    from vectordb_migrator_spark.operators.relational import (
        attribution_credits,
    )

    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    return attribution_credits(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type").isin("view", "click", "signup")),
        unit_col="user_id",
        conv_ts_col="ts",
        conv_id_col="event_id",
        touch_ts_col="ts",
        touch_type_col="event_type",
        touch_id_col="event_id",
        lookback_s=604800,
    )
