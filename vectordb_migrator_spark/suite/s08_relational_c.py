"""Registry family ``s08_relational_c`` — split from the monolithic
suite.py (round 8); registration order preserved via the
package ``__init__`` import sequence."""

from __future__ import annotations

# ruff: noqa: E501
from vectordb_migrator_spark.suite._shared import (
    DataFrame,
    F,
    SparkSession,
    W,
    _PROBE_SQL,
    _probe_vector,
    _t,
    cosine_topk,
    ivf_topk,
    query,
)



def _rm3_sql(
    terms: list[str], fb_docs: int = 10, fb_terms: int = 15, lam: float = 0.5
) -> str:
    """Oracle for x5_rm3_expansion: the x5_bm25_topk scoring CTE →
    top-``fb_docs`` feedback set → relevance-model term weights
    (round-9 DECIMAL contribution sums = order-independent) →
    RM3 interpolation with the uniform query model."""
    dfs = "\n".join(
        f"             , sum(CASE WHEN list_contains(toks, '{t}') THEN 1"
        f" ELSE 0 END)::DOUBLE AS df{i}"
        for i, t in enumerate(terms)
    )
    score = "\n        + ".join(
        f"ln((n_docs - df{i} + 0.5)/(df{i} + 0.5) + 1.0)"
        f" * len(list_filter(toks, x -> x = '{t}'))::DOUBLE * 2.2"
        f" / (len(list_filter(toks, x -> x = '{t}'))::DOUBLE"
        f" + 1.2*(1.0 - 0.75 + 0.75*len(toks)::DOUBLE/avgdl))"
        for i, t in enumerate(terms)
    )
    qvals = ", ".join(f"('{t}', {1.0 / len(terms)!r})" for t in terms)
    return rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), stats AS (
      SELECT count(*)::DOUBLE AS n_docs, avg(len(toks))::DOUBLE AS avgdl
{dfs}
      FROM t
    ), fb AS (
      SELECT doc_id, round({score}, 6) AS score
      FROM t, stats
      WHERE round({score}, 6) > 0
      ORDER BY score DESC, doc_id LIMIT {fb_docs}
    ), ws AS (SELECT sum(score) AS w FROM fb),
    ftoks AS (
      SELECT f.doc_id, f.score,
             list_filter(t.toks, x -> x <> '') AS toks
      FROM fb f JOIN t USING (doc_id)
    ), per AS (
      SELECT doc_id, score, len(toks)::DOUBLE AS dl,
             unnest(toks) AS term
      FROM ftoks
    ), tfd AS (
      SELECT doc_id, term, score, dl, count(*)::DOUBLE AS tf
      FROM per GROUP BY doc_id, term, score, dl
    ), rel AS (
      SELECT term,
             sum(round(score / (SELECT w FROM ws) * tf / dl,
                       9)::DECIMAL(18,9))::DOUBLE AS p_rel
      FROM tfd GROUP BY term
    ), qm AS (
      SELECT * FROM (VALUES {qvals}) q(term, p_q)
    )
    SELECT coalesce(rel.term, qm.term) AS term,
           round({lam!r} * coalesce(p_q, 0.0)
                 + {1.0 - lam!r} * coalesce(p_rel, 0.0), 6) AS weight
    FROM rel FULL OUTER JOIN qm ON rel.term = qm.term
    ORDER BY weight DESC, term LIMIT {fb_terms}"""


@query("x5_rm3_expansion", _rm3_sql(["vector", "hash", "join"]))
def x5_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — RM3 pseudo-relevance-feedback query expansion (round 7):
    BM25's top-10 for ['vector','hash','join'] become the pseudo-
    relevant set, their length-normalized, score-weighted term
    distribution is the relevance model, and λ=0.5 interpolation with
    the uniform query model yields the expanded query — the classic
    sparse-retrieval quality lever (Lavrenko & Croft; RM3). The only
    corpus-sized work is the ONE BM25 pass; the term model is built
    over 10 joined-back documents. Per-doc contributions round to 9
    and sum as DECIMAL (order-independent), so the full oracle
    hash-matches (operators/ranking.py:rm3_expansion)."""
    from vectordb_migrator_spark.operators.ranking import rm3_expansion

    return rm3_expansion(
        _t(spark, sf_dir, "documents"),
        ["vector", "hash", "join"],
        fb_docs=10,
        fb_terms=15,
        lam=0.5,
    )


@query(
    "x4_centroid_auc",
    """
    WITH flat AS (
      SELECT u.pos AS pos, u.val AS val
      FROM (SELECT unnest([{'pos': i, 'val': embedding[i]::DOUBLE}
                           for i in range(1, len(embedding) + 1)]) AS u
            FROM embeddings WHERE label = 0)
    ),
    c AS (SELECT pos, avg(val) AS v FROM flat GROUP BY pos),
    s AS (
      SELECT p.vec_id,
             CASE WHEN p.label = 0 THEN 1 ELSE 0 END AS lab,
             round(sum(p.embedding[c.pos]::DOUBLE * c.v)
                   / (sqrt(sum(p.embedding[c.pos]::DOUBLE
                               * p.embedding[c.pos]::DOUBLE))
                      * sqrt(sum(c.v * c.v))), 6) AS score
      FROM embeddings p, c
      GROUP BY p.vec_id, p.label
    ),
    d AS (
      SELECT score, sum(lab)::BIGINT AS cp,
             sum(1 - lab)::BIGINT AS cn
      FROM s GROUP BY score
    ),
    w AS (
      SELECT cp, cn,
             coalesce(sum(cn) OVER (ORDER BY score
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS cum_n
      FROM d
    )
    SELECT sum(cp)::BIGINT AS n_pos, sum(cn)::BIGINT AS n_neg,
           round(sum(cp * (cum_n + 0.5 * cn))::DOUBLE
                 / (sum(cp)::DOUBLE * sum(cn)), 6) AS auc
    FROM w
    """,
)
def x4_centroid_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — ROC AUC of similarity-to-class-prototype as a retrieval
    separability gauge (round 7): every embedding scores by cosine to
    the label-0 centroid, label-0 membership is the positive class,
    and AUC = U/(n⁺·n⁻) says in ONE number whether prototype
    similarity separates the class (the go/no-go before trusting
    centroid routing like ``x4_kmeans_ivf``'s). Computed WITHOUT
    ranking raw rows: scores round to 6dp (absorbing reduction-order
    ulps, the ``x3_label_centroids`` contract) and fold to
    per-distinct-score class counts; U is one window over that frame
    (operators/scale.py:auc_score). Full oracle."""
    from vectordb_migrator_spark.operators.scale import auc_score

    e = _t(spark, sf_dir, "embeddings").withColumn(
        "emb", F.col("embedding").cast("array<double>")
    )
    cent = (
        e.filter(F.col("label") == 0)
        .select(F.posexplode("emb").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg("val").alias("v"))
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "v"))
            ).alias("pv")
        )
        .select(
            F.transform(F.col("pv"), lambda s: s.getField("v")).alias(
                "c"
            )
        )
    )
    dot = F.aggregate(
        F.zip_with("emb", "c", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    se = F.aggregate(
        F.transform("emb", lambda a: a * a),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sc = F.aggregate(
        F.transform("c", lambda a: a * a),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        F.round(dot / (F.sqrt(se) * F.sqrt(sc)), 6).alias("score"),
        (F.col("label") == 0).cast("int").alias("lab"),
    )
    return auc_score(scored, score_col="score", label_col="lab")


@query(
    "x3_silhouette",
    """
    WITH flat AS (
      SELECT label, u.pos AS pos, u.val AS val
      FROM (SELECT label,
                   unnest([{'pos': i, 'val': embedding[i]::DOUBLE}
                           for i in range(1, len(embedding) + 1)]) AS u
            FROM embeddings)
    ),
    means AS (
      SELECT label, pos, avg(val) AS v FROM flat GROUP BY label, pos
    ),
    d AS (
      SELECT p.vec_id, p.label AS own, m.label AS cl,
             sqrt(sum((p.embedding[m.pos]::DOUBLE - m.v)
                      * (p.embedding[m.pos]::DOUBLE - m.v))) AS dist
      FROM embeddings p, means m
      GROUP BY 1, 2, 3
    ),
    ab AS (
      SELECT vec_id, own,
             min(CASE WHEN cl = own THEN dist END) AS a,
             min(CASE WHEN cl <> own THEN dist END) AS b
      FROM d GROUP BY 1, 2
    )
    SELECT own::BIGINT AS label, count(*)::BIGINT AS n,
           round(avg(a), 6) AS mean_intra,
           round(avg(b), 6) AS mean_nearest,
           round(avg((b - a) / nullif(greatest(a, b), 0)), 6)
             AS silhouette
    FROM ab GROUP BY own ORDER BY own
    """,
)
def x3_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — centroid-based silhouette of the label clustering (round
    7): per class, mean distance to the own-class prototype vs the
    nearest other prototype and the (b−a)/max(a,b) silhouette — the
    clustering-quality readout that says whether the label structure
    is actually separable in embedding space (feeding expectations
    for ``x4_kmeans_ivf`` and the classifier family). The O(n²)
    pairwise silhouette is replaced by k centroid distances — the
    only formulation that survives corpus scale: centroids are one
    (cluster,pos,val) shuffle, each point meets the k-row centroid
    table via broadcast, and only (id, cluster, dist) rows exist
    (operators/clustering.py:silhouette_report). Full oracle; 6dp
    rounding absorbs reduction-order ulps as in
    ``x3_label_centroids``."""
    from vectordb_migrator_spark.operators.clustering import (
        silhouette_report,
    )

    e = _t(spark, sf_dir, "embeddings").withColumn(
        "label", F.col("label").cast("long")
    )
    return silhouette_report(e, cluster_col="label")


@query(
    "x3_label_centroids",
    """
    WITH flat AS (
      SELECT label, u.pos AS pos, u.val AS val
      FROM (SELECT label,
                   unnest([{'pos': i, 'val': embedding[i]::DOUBLE}
                           for i in range(1, len(embedding) + 1)]) AS u
            FROM embeddings)
    ), means AS (
      SELECT label, pos, avg(val) AS v FROM flat GROUP BY label, pos
    )
    SELECT label::BIGINT AS label,
           array_to_string(list(round(v, 6)::DECIMAL(12,6)::VARCHAR
                               ORDER BY pos), ',') AS centroid,
           count(*)::BIGINT AS dim
    FROM means GROUP BY label ORDER BY label
    """,
)
def x3_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — per-class mean embedding (class prototypes / the pooling
    primitive behind ivf_build_centroids): posexplode → per-(label,
    pos) avg → ordered reassembly; the shuffle carries (label, pos,
    val) triples, never whole vectors. Centroid serialized (driver
    canon can't sort array cells); components rounded to 6dp on both
    sides to absorb reduction-order ulps in the avg."""
    from vectordb_migrator_spark.operators.similarity import (
        ivf_build_centroids,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents = ivf_build_centroids(e, cluster_col="label")
    return cents.select(
        F.col("cluster").cast("long").alias("label"),
        F.array_join(
            F.transform(
                F.col("centroid"),
                # fixed-scale decimal string: double->string would emit
                # scientific notation for small components in Spark but
                # not DuckDB
                lambda v: F.round(v, 6).cast("decimal(12,6)").cast("string"),
            ),
            ",",
        ).alias("centroid"),
        F.size("centroid").cast("long").alias("dim"),
    ).orderBy("label")


@query("x4_kmeans_ivf")  # iterative Lloyd fit — not SQL-expressible
def x4_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — the full ANN build path: deterministic Lloyd k-means fits
    the coarse quantizer (k=8), then IVF probes the 2 best clusters.
    Differential-tested against a NumPy Lloyd reference in
    tests/test_clustering.py; recall vs brute force asserted there
    too (rows-only here: iterative fit has no SQL oracle)."""
    from vectordb_migrator_spark.operators.clustering import kmeans_fit
    from vectordb_migrator_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    assigned, _, _ = kmeans_fit(e, k=8, max_iter=10)
    return ivf_topk(assigned, probe, cluster_col="cluster", k=10).orderBy(
        F.desc("score"), "vec_id"
    )


@query(
    "x4_retrieval_metrics",
    f"""
    WITH p AS (SELECT {_PROBE_SQL} AS pv
    ), truth AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               round(list_dot_product(embedding::DOUBLE[], pv) /
                     (sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[])) *
                      sqrt(list_dot_product(pv, pv))), 6) AS score
        FROM embeddings, p ORDER BY score DESC, vec_id LIMIT 10)
    ), cand AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY hamming, vec_id) AS rank
      FROM (
        SELECT vec_id,
               len(list_filter(range(1, len(embedding) + 1),
                               i -> (embedding[i] > 0) != (pv[i] > 0)))::INT
                 AS hamming
        FROM embeddings, p)
      QUALIFY rank <= 10
    ), hits AS (
      SELECT c.rank FROM cand c JOIN truth t USING (vec_id)
    )
    SELECT 10::BIGINT AS n_relevant, 10::BIGINT AS n_retrieved,
           count(*)::BIGINT AS n_hits,
           round(count(*)::DOUBLE / 10.0, 6) AS recall_at_k,
           round(coalesce(1.0::DOUBLE / min(rank), 0.0), 6) AS mrr
    FROM hits
    """,
)
def x4_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — ANN quality gate: recall@10 and MRR of the binary-Hamming
    retrieval path against exact cosine truth, as a DataFrame op (one
    broadcast semi-join + aggregate over list-depth inputs)."""
    from vectordb_migrator_spark.operators.ranking import retrieval_metrics
    from vectordb_migrator_spark.operators.similarity import (
        cosine_topk,
        hamming_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    truth = cosine_topk(e, probe, k=10).select("vec_id")
    cand = hamming_topk(e, probe, k=10)
    return retrieval_metrics(
        cand, truth, k=10, rank_by=[("hamming", True)]
    )


@query(
    "x4_hamming_topk",
    f"""
    WITH p AS (SELECT {_PROBE_SQL} AS pv)
    SELECT vec_id,
           len(list_filter(range(1, len(embedding) + 1),
                           i -> (embedding[i] > 0) != (pv[i] > 0)))::INT
             AS hamming
    FROM embeddings, p
    ORDER BY hamming, vec_id LIMIT 10
    """,
)
def x4_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — binary-quantized retrieval: sign-bit signatures (64 dims →
    one long), Hamming distance = XOR + popcount per row. The oracle
    computes the same distance semantically (count of sign
    disagreements) without bit packing — equal by construction."""
    from vectordb_migrator_spark.operators.similarity import hamming_topk

    e = _t(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    return hamming_topk(e, probe, k=10)


_NDCG_IDEAL = sum((11 - r) / __import__("math").log2(r + 1) for r in range(1, 11))


@query(
    "x4_ndcg_report",
    f"""
    WITH p AS (SELECT {_PROBE_SQL} AS pv),
    truth AS (
      SELECT vec_id, row_number() OVER (ORDER BY score DESC, vec_id)
               AS trank
      FROM (
        SELECT vec_id,
               round(list_dot_product(embedding::DOUBLE[], pv) /
                     (sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[])) *
                      sqrt(list_dot_product(pv, pv))), 6) AS score
        FROM embeddings, p
      ) ORDER BY score DESC, vec_id LIMIT 10
    ),
    ham AS (
      SELECT vec_id, row_number() OVER (ORDER BY hamming, vec_id) AS pos
      FROM (
        SELECT vec_id,
               len(list_filter(range(1, len(embedding) + 1),
                               i -> (embedding[i] > 0) != (pv[i] > 0)))::INT
                 AS hamming
        FROM embeddings, p
      ) ORDER BY hamming, vec_id LIMIT 10
    ),
    g AS (
      SELECT coalesce(11 - t.trank, 0) / log2(h.pos + 1) AS gain
      FROM ham h LEFT JOIN truth t USING (vec_id)
    )
    SELECT round(sum(gain), 6) AS dcg,
           round({_NDCG_IDEAL!r}, 6)::DOUBLE AS idcg,
           round(sum(gain) / {_NDCG_IDEAL!r}, 6) AS ndcg
    FROM g
    """,
)
def x4_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — nDCG@10 of the binary-Hamming retrieval path (round 6):
    the position-aware metric ``x4_retrieval_metrics``' recall/MRR
    can't express — a system returning the right ids in the wrong
    order scores below one that ranks them correctly. Graded gains are
    the standard linear grading off the exact cosine ranking (truth
    rank r worth 11−r), IDCG is closed-form
    (:func:`~vectordb_migrator_spark.operators.ranking.ndcg_at_k`).
    List-depth math: both sides are top-10 frames; the only
    corpus-sized work is the two scoring scans the retrieval paths
    already pay."""
    from pyspark.sql import Window as W

    from vectordb_migrator_spark.operators.ranking import ndcg_at_k
    from vectordb_migrator_spark.operators.similarity import (
        cosine_topk,
        hamming_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    truth = cosine_topk(e, probe, k=10).withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score"), "vec_id"))
    )
    cands = hamming_topk(e, probe, k=10)
    return ndcg_at_k(cands, truth, k=10, rank_by=[("hamming", True)])


@query(
    "x4_binary_rerank",
    f"""
    WITH p AS (SELECT {_PROBE_SQL} AS pv),
    short AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings, p
      ORDER BY len(list_filter(range(1, len(embedding) + 1),
                               i -> (embedding[i] > 0) != (pv[i] > 0))),
               vec_id
      LIMIT 40
    )
    SELECT s.vec_id,
           round(list_dot_product(s.v, p.pv) /
                 (sqrt(list_dot_product(s.v, s.v)) *
                  sqrt(list_dot_product(p.pv, p.pv))), 6) AS score
    FROM short s, p
    ORDER BY score DESC, s.vec_id LIMIT 10
    """,
)
def x4_binary_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — two-stage retrieval: Hamming shortlist (over-fetch 4k) →
    exact float-cosine rerank → top-k. One compact-signature scan of
    the corpus; full-precision math on shortlist rows only."""
    from vectordb_migrator_spark.operators.similarity import binary_rerank_topk

    e = _t(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    return binary_rerank_topk(e, probe, k=10, shortlist=40)


@query(
    "merge_upsert_orders",
    """
    WITH cur AS (
      SELECT o_orderkey, o_totalprice, 1::BIGINT AS version, 0 AS src
      FROM orders
    ), upd AS (
      SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
             2::BIGINT AS version, 1 AS src
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT -1 AS o_orderkey, 42.0 AS o_totalprice, 2::BIGINT AS version,
             1 AS src
    ), merged AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY version DESC, src DESC) AS rn
      FROM (SELECT * FROM cur UNION ALL SELECT * FROM upd)
    )
    SELECT o_orderkey, o_totalprice, version FROM merged
    WHERE rn = 1 ORDER BY o_orderkey
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins CDC merge (batch twin of the foreachBatch upsert):
    10% of orders re-priced (+1000, exact in float64) at version 2 plus one brand-new key fold
    into the snapshot through a single key-partitioned window."""
    from vectordb_migrator_spark.operators.relational import merge_upsert

    o = _t(spark, sf_dir, "orders")
    cur = o.select("o_orderkey", "o_totalprice", F.lit(1).cast("long").alias("version"))
    upd = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
            F.lit(2).cast("long").alias("version"),
        )
        .unionByName(
            spark.createDataFrame(
                [(-1, 42.0, 2)], "o_orderkey long, o_totalprice double, version long"
            )
        )
    )
    return merge_upsert(
        cur, upd, key_cols=["o_orderkey"], version_col="version"
    ).orderBy("o_orderkey")


@query(
    "x4_hybrid_rrf",
    rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), stats AS (
      SELECT count(*)::DOUBLE AS n_docs, avg(len(toks))::DOUBLE AS avgdl,
             sum(CASE WHEN list_contains(toks, 'vector') THEN 1 ELSE 0 END)::DOUBLE AS df0,
             sum(CASE WHEN list_contains(toks, 'hash') THEN 1 ELSE 0 END)::DOUBLE AS df1
      FROM t
    ), bm_raw AS (
      SELECT doc_id AS id,
        ln((n_docs - df0 + 0.5)/(df0 + 0.5) + 1.0)
          * len(list_filter(toks, x -> x = 'vector'))::DOUBLE * 2.2
          / (len(list_filter(toks, x -> x = 'vector'))::DOUBLE
             + 1.2*(1.0 - 0.75 + 0.75*len(toks)::DOUBLE/avgdl))
        + ln((n_docs - df1 + 0.5)/(df1 + 0.5) + 1.0)
          * len(list_filter(toks, x -> x = 'hash'))::DOUBLE * 2.2
          / (len(list_filter(toks, x -> x = 'hash'))::DOUBLE
             + 1.2*(1.0 - 0.75 + 0.75*len(toks)::DOUBLE/avgdl))
        AS raw
      FROM t, stats
    ), bm AS (
      SELECT id, round(raw, 6) AS score FROM bm_raw
      WHERE round(raw, 6) > 0 ORDER BY score DESC, id LIMIT 50
    ), p AS (SELECT {_PROBE_SQL} AS pv
    ), cos AS (
      SELECT vec_id AS id,
             round(list_dot_product(embedding::DOUBLE[], pv) /
                   (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                    sqrt(list_dot_product(pv, pv))), 6) AS score
      FROM embeddings, p
      ORDER BY score DESC, id LIMIT 50
    ), u AS (
      SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM bm
      UNION ALL
      SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM cos
    )
    SELECT id, round(sum(1.0::DOUBLE/(60 + rank)), 6) AS score,
           count(*)::BIGINT AS n_lists
    FROM u GROUP BY id ORDER BY score DESC, id LIMIT 10
    """,
)
def x4_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — hybrid sparse+dense retrieval: BM25 top-50 fused with
    brute-force cosine top-50 by reciprocal-rank fusion (rrf_k=60).
    The heavy scans live in the two upstream operators; fusion touches
    only the truncated (id, score) lists."""
    from vectordb_migrator_spark.operators.ranking import bm25_topk, rrf_fuse
    from vectordb_migrator_spark.operators.similarity import cosine_topk

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    sparse = bm25_topk(d, ["vector", "hash"], k=50).select(
        F.col("doc_id").alias("id"), "score"
    )
    dense = cosine_topk(e, probe, k=50).select(
        F.col("vec_id").alias("id"), "score"
    )
    return rrf_fuse([sparse, dense], k=10).orderBy(F.desc("score"), "id")


@query(
    "x5_boilerplate_removal",
    """
    WITH docs AS (
      SELECT doc_id,
             'COPYRIGHT 2024 EXAMPLE CORP' || chr(10) || text || chr(10) ||
             CASE WHEN doc_id % 2 = 0 THEN 'promo line'
                  ELSE 'doc ' || doc_id::VARCHAR || ' signature' END AS text
      FROM documents
    ), flat AS (
      SELECT doc_id, u.pos AS pos, u.line AS line
      FROM (SELECT doc_id,
                   unnest([{'pos': i, 'line': l[i]}
                           for i in range(1, len(l) + 1)]) AS u
            FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs))
    ), hot AS (
      SELECT line
      FROM (SELECT line, count(DISTINCT doc_id) AS dfc FROM flat GROUP BY line)
      WHERE dfc::DOUBLE > (SELECT count(*) FROM docs)::DOUBLE * 0.3
    ), kept AS (
      SELECT * FROM flat WHERE line NOT IN (SELECT line FROM hot)
    ), rebuilt AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS cleaned,
             count(*)::BIGINT AS n_kept_lines
      FROM kept GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, count(*)::BIGINT AS n_lines FROM flat GROUP BY doc_id
    )
    SELECT t.doc_id, coalesce(r.cleaned, '') AS cleaned,
           coalesce(r.n_kept_lines, 0)::BIGINT AS n_kept_lines,
           (t.n_lines - coalesce(r.n_kept_lines, 0))::BIGINT
             AS n_removed_lines
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def x5_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — boilerplate line removal (CCNet/RefinedWeb cleanup): lines
    in >30% of docs are dropped, documents reassembled in order. The
    corpus docs have no newlines, so each is wrapped with a universal
    copyright header (df=100%, removed), a promo line on even ids
    (df=50%, removed), and a unique signature on odd ids (kept)."""
    from vectordb_migrator_spark.operators.cleaning import (
        remove_boilerplate_lines,
    )

    d = _t(spark, sf_dir, "documents")
    synth = d.select(
        "doc_id",
        F.concat(
            F.lit("COPYRIGHT 2024 EXAMPLE CORP\n"),
            F.col("text"),
            F.lit("\n"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("promo line")).otherwise(
                F.concat(
                    F.lit("doc "),
                    F.col("doc_id").cast("string"),
                    F.lit(" signature"),
                )
            ),
        ).alias("text"),
    )
    return remove_boilerplate_lines(synth, max_df_frac=0.3).orderBy("doc_id")


@query(
    "x13_funnel_latency",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = 'view' AND user_id IS NOT NULL
      GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.ts1
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT epoch(p.ts2) - epoch(v.ts1) AS s
      FROM v JOIN p ON v.user_id = p.user_id
    )
    SELECT count(*)::BIGINT AS n_converted,
           round(quantile_cont(s, 0.5), 6) AS p50_s,
           round(quantile_cont(s, 0.9), 6) AS p90_s,
           round(quantile_cont(s, 0.99), 6) AS p99_s,
           round(avg(s), 6) AS mean_s
    FROM lat
    """,
)
def x13_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — view→purchase conversion latency (round 7): for every
    user, seconds from first view to first subsequent purchase, with
    exact p50/p90/p99 + mean — the time-to-convert companion of
    ``funnel_view_click_purchase``'s stage counts (a funnel that
    converts in a week is a different product than one converting in
    a minute) and the latency view ``x13_kaplan_meier`` treats with
    censoring. Two per-user min-aggregates and one id-width join fold
    the log to a per-user latency frame; exact interpolated
    percentiles match quantile_cont. Full oracle."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    lat = v.join(p, "user_id").select(
        (
            F.col("ts2").cast("double") - F.col("ts1").cast("double")
        ).alias("s")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.expr("percentile(s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(s, 0.9)"), 6).alias("p90_s"),
        F.round(F.expr("percentile(s, 0.99)"), 6).alias("p99_s"),
        F.round(F.avg("s"), 6).alias("mean_s"),
    )


@query(
    "funnel_view_click_purchase",
    """
    WITH t1 AS (
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.ts1
        AND e.ts <= t1.ts1 + INTERVAL 24 HOURS
      GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM events e JOIN t2 ON e.user_id = t2.user_id
                    JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
        AND e.ts <= t1.ts1 + INTERVAL 24 HOURS
      GROUP BY e.user_id
    ), stages AS (
      SELECT u.user_id,
             (CASE WHEN t3.user_id IS NOT NULL THEN 3
                   WHEN t2.user_id IS NOT NULL THEN 2
                   WHEN t1.user_id IS NOT NULL THEN 1
                   ELSE 0 END) AS stage
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN t1 ON u.user_id = t1.user_id
      LEFT JOIN t2 ON u.user_id = t2.user_id
      LEFT JOIN t3 ON u.user_id = t3.user_id
    )
    SELECT stage::INT AS stage, count(*)::BIGINT AS n_users
    FROM stages GROUP BY stage ORDER BY stage
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase within a 24h first-touch
    conversion window: the single-scan fold formulation (one exchange
    on user_id, codegen walk) checked against the oracle's k-way
    successive-minima joins — equivalent by the
    greedy-earliest-completion argument with first-touch anchoring."""
    from vectordb_migrator_spark.operators.relational import funnel_stages

    ev = _t(spark, sf_dir, "events")
    return (
        funnel_stages(ev, ["view", "click", "purchase"], within="24 hours")
        .groupBy("stage")
        .agg(F.count("*").alias("n_users"))
        .orderBy("stage")
    )


@query(
    "cohort_weekly_retention",
    """
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_ts
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk_ts FROM events
    ), sizes AS (
      SELECT cohort_ts, count(*) AS cohort_size FROM firsts GROUP BY cohort_ts
    ), active AS (
      SELECT f.cohort_ts,
             (date_diff('day', f.cohort_ts, a.wk_ts) / 7)::BIGINT AS week_n,
             count(*)::BIGINT AS n_active
      FROM activity a JOIN firsts f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT strftime(c.cohort_ts, '%Y-%m-%d') AS cohort, c.week_n, c.n_active,
           round(c.n_active::DOUBLE / s.cohort_size::DOUBLE, 6) AS retention
    FROM active c JOIN sizes s USING (cohort_ts)
    ORDER BY cohort, week_n
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: activity collapses to one row per
    user-week BEFORE the cohort join (bounded by users × weeks, not
    event volume); cohort sizes broadcast back."""
    from vectordb_migrator_spark.operators.relational import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev).orderBy("cohort", "week_n")


@query(
    "x5_ngram_contamination",
    r"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS g
      FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents)
    ), train_grams AS (
      SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 5 != 0
    ), test_flat AS (
      SELECT doc_id, len(g)::BIGINT AS n_grams, unnest(g) AS gram
      FROM sh WHERE doc_id % 5 = 0
    ), hits AS (
      SELECT doc_id, n_grams, count(*)::BIGINT AS n_contaminated
      FROM test_flat JOIN train_grams USING (gram)
      GROUP BY doc_id, n_grams
    )
    SELECT s.doc_id, len(s.g)::BIGINT AS n_grams,
           coalesce(h.n_contaminated, 0)::BIGINT AS n_contaminated,
           round(coalesce(h.n_contaminated, 0)::DOUBLE
                 / len(s.g)::DOUBLE, 6) AS contamination,
           (round(coalesce(h.n_contaminated, 0)::DOUBLE
                  / len(s.g)::DOUBLE, 6) >= 0.3) AS is_contaminated
    FROM sh s LEFT JOIN hits h USING (doc_id)
    WHERE s.doc_id % 5 = 0 ORDER BY s.doc_id
    """,
)
def x5_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — benchmark decontamination: fraction of each TEST doc's
    3-gram shingles present anywhere in the TRAIN split (every 5th doc
    held out). Train reduces to DISTINCT grams before the semi-join;
    production recipes use 8-13-gram windows — this corpus's docs are
    short word soup, so n=3 keeps the check non-vacuous."""
    from vectordb_migrator_spark.operators.cleaning import ngram_contamination

    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 5 != 0)
    test = d.filter(F.col("doc_id") % 5 == 0)
    return ngram_contamination(train, test, n=3, threshold=0.3).orderBy(
        "doc_id"
    )


@query(
    "x5_hot_grams",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                                   for i in range(1, len(toks) - 1)])) AS gram
      FROM t WHERE len(toks) >= 3
    ),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
    SELECT gram, count(*)::BIGINT AS df,
           round(count(*) / any_value(n.n_docs), 6) AS df_share
    FROM sh, n GROUP BY gram
    ORDER BY df DESC, gram LIMIT 20
    """,
)
def x5_hot_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — hot-shingle report (round 5): the 20 most document-frequent
    n-grams with their corpus share — the operational tuning aid for
    every ``max_df`` knob in the gram-join family (a gram shared by 4%
    of a 100 TB corpus is a skewed-bucket scale-killer; this report is
    how you pick the cap before it bites). ONE map-side-combinable df
    shuffle + TakeOrdered(20); the normalizer is a broadcast 1-row
    count."""
    from vectordb_migrator_spark.functions.text import ws_tokens
    from vectordb_migrator_spark.operators.dedup import shingles

    docs = _t(spark, sf_dir, "documents")
    total = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    g = docs.filter(F.size(ws_tokens("text")) >= 3).select(
        F.explode(shingles("text", 3)).alias("gram")
    )
    return (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(total))
        .select(
            "gram",
            F.col("df").cast("long").alias("df"),
            F.round(F.col("df") / F.col("n_docs"), 6).alias("df_share"),
        )
        .orderBy(F.desc("df"), "gram")
        .limit(20)
    )


@query(
    "x5_corpus_stats",
    r"""
    WITH m AS (
      SELECT count(*)::BIGINT AS n_docs,
             count(*) FILTER (
               regexp_replace(text, '^\s+|\s+$', '', 'g') = ''
             )::BIGINT AS n_empty,
             (count(*) - count(DISTINCT substr(md5(text), 1, 16)))::BIGINT
               AS n_exact_dups,
             sum(len(string_split_regex(lower(trim(text)), '\s+')))::BIGINT
               AS tok_total,
             sum(length(text))::BIGINT AS chars_total,
             quantile_cont(len(string_split_regex(lower(trim(text)), '\s+')),
                           0.5) AS tok_p50,
             quantile_cont(len(string_split_regex(lower(trim(text)), '\s+')),
                           0.9) AS tok_p90,
             count(*) FILTER (
               len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
               len(regexp_extract_all(text, '\b\d{3}[-.]\d{4}\b')) > 0
             )::BIGINT AS n_pii_docs
      FROM documents
    )
    SELECT *, round(tok_total::DOUBLE / n_docs::DOUBLE, 6) AS tok_mean FROM m
    """,
)
def x5_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — one-row corpus health report (volume, emptiness, exact-dup
    mass, token-length distribution, PII incidence): the pre/post
    ingest gate. One scan, all map-side-combinable aggregates; the
    mean derives from the exact long sum, so it is bit-deterministic
    across engines."""
    from vectordb_migrator_spark.operators.cleaning import corpus_stats

    return corpus_stats(_t(spark, sf_dir, "documents"))


@query(
    "x5_unigram_surprisal",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ),
    t2 AS (SELECT * FROM toks WHERE tok <> ''),
    counts AS (SELECT tok, count(*)::DOUBLE AS c FROM t2 GROUP BY tok),
    vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 1000),
    stats AS (SELECT (SELECT count(*) FROM t2)::DOUBLE AS n_total,
                     (SELECT count(*) FROM vocab)::DOUBLE AS n_vocab)
    SELECT t.doc_id,
           round(avg(-log2((coalesce(v.c, 0) + 0.5)
                           / (s.n_total + 0.5 * (s.n_vocab + 1)))), 6)
             AS surprisal,
           count(*)::BIGINT AS n_tok
    FROM t2 t LEFT JOIN vocab v USING (tok), stats s
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def x5_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — per-document mean unigram surprisal under a corpus LM
    (top-1000 vocab + smoothed OOV bucket): the cheap perplexity-filter
    stand-in. Token counts shuffle with map-side combine; the vocab is
    a TakeOrdered broadcast; corpus totals are a 1-row cross join."""
    from vectordb_migrator_spark.operators.cleaning import unigram_surprisal

    return unigram_surprisal(
        _t(spark, sf_dir, "documents"), vocab_size=1000
    ).orderBy("doc_id")


@query(
    "x5_ccnet_buckets",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ),
    t2 AS (SELECT * FROM toks WHERE tok <> ''),
    counts AS (SELECT tok, count(*)::DOUBLE AS c FROM t2 GROUP BY tok),
    vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 1000),
    stats AS (SELECT (SELECT count(*) FROM t2)::DOUBLE AS n_total,
                     (SELECT count(*) FROM vocab)::DOUBLE AS n_vocab),
    per AS (
      SELECT t.doc_id,
             round(avg(-log2((coalesce(v.c, 0) + 0.5)
                             / (s.n_total + 0.5 * (s.n_vocab + 1)))), 6)
               AS surprisal,
             count(*)::BIGINT AS n_tok
      FROM t2 t LEFT JOIN vocab v USING (tok), stats s
      GROUP BY t.doc_id
    ),
    b AS (
      SELECT doc_id, surprisal, n_tok,
             ntile(3) OVER (ORDER BY surprisal, doc_id) AS t
      FROM per
    )
    SELECT CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
           count(*)::BIGINT AS n,
           round(min(surprisal), 6) AS s_min,
           round(max(surprisal), 6) AS s_max,
           round(avg(surprisal), 6) AS s_mean,
           sum(n_tok)::BIGINT AS tokens
    FROM b GROUP BY t ORDER BY t
    """,
)
def x5_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — CCNet head/middle/tail buckets (round 6): the published
    CCNet recipe (Wenzek et al. 2020) sorts the corpus by language-
    model perplexity and splits it into thirds — "head" (lowest
    perplexity, Wikipedia-like) trains first-class, "tail" is dropped
    or down-weighted. Here the LM is the engine's own smoothed unigram
    model (``x5_unigram_surprisal``), the tertiles are deterministic
    (surprisal, doc_id ordering), and the report carries each bucket's
    boundaries — the thresholds a production filter then applies
    stream-side. ONE token-count shuffle builds the LM; the global
    ntile is the honest exact-tertile cost (approximate cuts at 100 TB
    come from the log-histogram store instead)."""
    from pyspark.sql import Window as W

    from vectordb_migrator_spark.operators.cleaning import unigram_surprisal

    per = unigram_surprisal(_t(spark, sf_dir, "documents"), vocab_size=1000)
    b = per.withColumn(
        "t", F.ntile(3).over(W.orderBy("surprisal", "doc_id"))
    )
    return (
        b.groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("surprisal"), 6).alias("s_min"),
            F.round(F.max("surprisal"), 6).alias("s_max"),
            F.round(F.avg("surprisal"), 6).alias("s_mean"),
            F.sum("n_tok").cast("long").alias("tokens"),
        )
        .select(
            "t",
            F.when(F.col("t") == 1, "head")
            .when(F.col("t") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            "n",
            "s_min",
            "s_max",
            "s_mean",
            "tokens",
        )
        .orderBy("t")
        .drop("t")
    )


@query(
    "outer_join_urgent_counts",
    """
    SELECT c.c_custkey, coalesce(u.n, 0)::BIGINT AS urgent_orders
    FROM customer c
    LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders
               WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) u
      ON u.o_custkey = c.c_custkey
    ORDER BY c_custkey
    """,
)
def outer_join_urgent_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with zero-fill: every customer row survives,
    absent aggregates become explicit 0 — aggregate-then-join (the
    small aggregated side broadcasts) rather than join-then-aggregate
    over duplicated customer rows."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    u = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("n"))
    )
    return (
        c.join(F.broadcast(u), "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("urgent_orders"),
        )
        .orderBy("c_custkey")
    )
