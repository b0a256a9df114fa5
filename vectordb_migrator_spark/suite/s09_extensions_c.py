"""Registry family ``s09_extensions_c`` — split from the monolithic
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
    _PROBE_SQL,
    _probe_vector,
    _t,
    ngram_jaccard_pairs,
    np,
    query,
)



@query(
    "x11_sql_api_topk",
    f"""
    WITH p AS (SELECT {_PROBE_SQL} AS pv)
    SELECT vec_id,
           round(list_dot_product(embedding::DOUBLE[], pv) /
                 (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                  sqrt(list_dot_product(pv, pv))), 6) AS score
    FROM embeddings, p
    ORDER BY score DESC, vec_id LIMIT 10
    """,
)
def x11_sql_api_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11 — the pure-SQL API surface: Spark 4 SQL scalar UDFs
    (``vm_cosine``) are inlined by Catalyst into the same codegen
    fold as the Column-API kernel, so ``spark.sql`` users get the
    engine with zero Python in the plan. Same result (and oracle) as
    ``x3_cosine_topk`` by construction."""
    from vectordb_migrator_spark.functions.sql_udfs import register_sql_functions

    register_sql_functions(spark)
    probe = _probe_vector(spark, sf_dir)
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView("vm_embeddings")
    probe_sql = "array(" + ", ".join(f"{x}D" for x in probe) + ")"
    return spark.sql(
        f"""
        SELECT vec_id,
               round(vm_cosine(cast(embedding AS array<double>), {probe_sql}),
                     6) AS score
        FROM vm_embeddings
        ORDER BY score DESC, vec_id LIMIT 10
        """
    )


@query(
    "x11_sql_curation",
    r"""
    WITH tok AS (
      SELECT doc_id, lang,
             md5(text) AS fp,
             len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
      FROM documents
    ),
    kept AS (SELECT * FROM tok WHERE n_tok >= 20),
    uniq AS (
      SELECT doc_id, lang, n_tok FROM (
        SELECT doc_id, lang, n_tok,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id)
                 AS rn
        FROM kept) WHERE rn = 1
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(n_tok)::BIGINT AS total_tokens,
           round(avg(n_tok), 6) AS mean_tokens
    FROM uniq GROUP BY lang ORDER BY lang
    """,
)
def x11_sql_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11 — a curation pipeline written ENTIRELY as SQL text (round
    7): length gate → exact-dup removal (md5 fingerprint, min-id
    keeper) → per-language token budget, submitted via ``spark.sql``
    over a registered view — proving a SQL-first user drives the same
    engine (Catalyst compiles this to the identical codegen plan the
    Column-API ``x0_training_pipeline`` stages get; same pushdown,
    same map-side combines). Full oracle — near-verbatim, dialect
    aside."""
    _t(spark, sf_dir, "documents").createOrReplaceTempView(
        "vm_documents"
    )
    return spark.sql(
        r"""
        WITH tok AS (
          SELECT doc_id, lang,
                 md5(text) AS fp,
                 size(split(lower(trim(text)), '\\s+')) AS n_tok
          FROM vm_documents
        ),
        kept AS (SELECT * FROM tok WHERE n_tok >= 20),
        uniq AS (
          SELECT doc_id, lang, n_tok FROM (
            SELECT doc_id, lang, n_tok,
                   row_number() OVER (PARTITION BY fp
                                      ORDER BY doc_id) AS rn
            FROM kept) WHERE rn = 1
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               round(avg(n_tok), 6) AS mean_tokens
        FROM uniq GROUP BY lang ORDER BY lang
        """
    )


# ---------------------------------------------------------------------
# X5/X10 — hashed-feature linear classifiers (fastText / DSIR stand-ins)
# ---------------------------------------------------------------------

_NB_DIM = 64
_FHB64_SQL = (  # token array -> per-token md5 bucket array (mod 64)
    "list_transform(list_filter(string_split_regex(lower(trim({col})), "
    "'\\s+'), t -> t != ''), "
    "t -> CAST(CONCAT('0x', substr(md5(t), 1, 8)) AS BIGINT) % 64)"
)
_CNT64_SQL = (  # bucket array -> 64-dim count vector
    "[len(list_filter({bks}, b -> b = i))::DOUBLE for i in range(0, 64)]"
)


@query(
    "x5_nb_lang_classifier",
    rf"""
    WITH b AS (
      SELECT doc_id, lang, {_FHB64_SQL.format(col="text")} AS bks
      FROM documents
    ), cv AS (
      SELECT doc_id, lang, {_CNT64_SQL.format(bks="bks")} AS cnts FROM b
    ), cell AS (
      SELECT lang AS label, unnest(bks) AS bkt FROM b
    ), cnt AS (
      SELECT label, bkt, count(*)::DOUBLE AS n FROM cell GROUP BY 1, 2
    ), tot AS (
      SELECT label, sum(n) AS tot FROM cnt GROUP BY 1
    ), grid AS (
      SELECT t.label, g.i, t.tot, coalesce(c.n, 0) AS n
      FROM tot t CROSS JOIN range(0, 64) g(i)
      LEFT JOIN cnt c ON c.label = t.label AND c.bkt = g.i
    ), ll AS (
      SELECT label,
             list(round(ln((n + 1.0) / (tot + 64.0)), 9) ORDER BY i) AS ll
      FROM grid GROUP BY label
    ), prior AS (
      SELECT lang AS label,
             round(ln(count(*)::DOUBLE /
                      (SELECT count(*) FROM documents)), 9) AS lp
      FROM documents GROUP BY 1
    ), sc AS (
      SELECT cv.doc_id, cv.lang, l.label,
             round(p.lp + list_sum(
               [cv.cnts[i] * l.ll[i] for i in range(1, 65)]), 6) AS score
      FROM cv CROSS JOIN ll l JOIN prior p ON p.label = l.label
    ), pick AS (
      SELECT doc_id, lang, label AS pred,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, label DESC) AS rn
      FROM sc
    )
    SELECT lang, pred, count(*)::BIGINT AS n_docs
    FROM pick WHERE rn = 1
    GROUP BY lang, pred
    ORDER BY lang, pred
    """,
)
def x5_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — train-and-apply a hashed-unigram Naive Bayes language
    classifier (round 6): the fastText-LID stand-in every CCNet-style
    pipeline carries, expressed as pure counting. Fit is ONE corpus
    scan whose only shuffle is the ``(label, bucket)`` cell count
    (map-side combined, ≤ labels×64 cells); the model is collected
    (kilobytes — the k-means bounded-collect contract) and baked into
    a zero-shuffle codegen scoring pass over a SECOND scan: bucket
    counts projected once, per-label literal-array dot products,
    ``array_max`` argmax. Output is the label×prediction confusion
    matrix — on this shared-vocabulary synthetic fixture the classifier
    is majority-biased (the interesting artifact is the exact
    train→score reproducibility, which the full value-hash oracle
    certifies); ``tests/test_classify.py`` proves it separates a
    separable corpus. Reference has no classifier surface
    (`/root/reference/vectordb_migration/core/migrator.py` is
    transport-only) — extension mandate."""
    from vectordb_migrator_spark.operators.classify import nb_fit, nb_score

    docs = _t(spark, sf_dir, "documents")
    model = nb_fit(docs, "text", "lang", dim=_NB_DIM, alpha=1.0)
    return (
        nb_score(docs, model, "text", dim=_NB_DIM)
        .groupBy("lang", "pred")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "pred")
    )


def x5_classifier_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — Cohen's kappa for the NB language classifier (round 7):
    chance-corrected agreement between predictions and labels,
    computed off the SAME confusion matrix as
    ``x5_nb_lang_classifier`` — accuracy alone overstates a
    majority-biased classifier on skewed label sets (exactly this
    fixture), and κ = (p_o − p_e)/(1 − p_e) is the number a labeling
    pipeline actually gates on. The confusion frame is labels², so
    everything past the shared fit/score pass is driver-trivial; the
    oracle wraps the classifier's full fit+score SQL as a CTE. Full
    oracle."""
    # labels²-sized; checkpoint so the four marginal branches read
    # the materialized confusion, not four re-runs of the scorer
    conf = QUERIES["x5_nb_lang_classifier"](spark, sf_dir).localCheckpoint(
        eager=True
    )
    t = conf.agg(F.sum("n_docs").cast("double").alias("n"))
    po = (
        conf.filter(F.col("lang") == F.col("pred"))
        .agg(F.sum("n_docs").cast("double").alias("diag"))
    )
    rm = conf.groupBy("lang").agg(F.sum("n_docs").cast("double").alias("r"))
    cm = conf.groupBy("pred").agg(F.sum("n_docs").cast("double").alias("c"))
    pe = (
        rm.join(cm, rm["lang"] == cm["pred"])
        .agg(F.sum(F.col("r") * F.col("c")).alias("rc"))
    )
    return (
        t.crossJoin(po)
        .crossJoin(pe)
        .select(
            F.col("n").cast("long").alias("n"),
            F.round(F.col("diag") / F.col("n"), 6).alias("po"),
            F.round(F.col("rc") / (F.col("n") * F.col("n")), 6).alias("pe"),
            F.round(
                (F.col("diag") / F.col("n")
                 - F.col("rc") / (F.col("n") * F.col("n")))
                / (1 - F.col("rc") / (F.col("n") * F.col("n"))),
                6,
            ).alias("kappa"),
        )
    )


ORACLES["x5_classifier_kappa"] = (
    "WITH conf AS (" + ORACLES["x5_nb_lang_classifier"] + """),
    t AS (SELECT sum(n_docs)::DOUBLE AS n FROM conf),
    d AS (SELECT sum(n_docs)::DOUBLE AS diag FROM conf WHERE lang = pred),
    rm AS (SELECT lang, sum(n_docs)::DOUBLE AS r FROM conf GROUP BY lang),
    cm AS (SELECT pred, sum(n_docs)::DOUBLE AS c FROM conf GROUP BY pred),
    p AS (SELECT sum(rm.r * cm.c) AS rc
          FROM rm JOIN cm ON rm.lang = cm.pred)
    SELECT t.n::BIGINT AS n,
           round(d.diag / t.n, 6) AS po,
           round(p.rc / (t.n * t.n), 6) AS pe,
           round((d.diag / t.n - p.rc / (t.n * t.n))
                 / (1 - p.rc / (t.n * t.n)), 6) AS kappa
    FROM t, d, p"""
)
QUERIES["x5_classifier_kappa"] = x5_classifier_kappa


@query(
    "x10_dsir_select",
    rf"""
    WITH b AS (
      SELECT doc_id, lang, source, {_FHB64_SQL.format(col="text")} AS bks
      FROM documents
    ), cv AS (
      SELECT doc_id, lang, source, {_CNT64_SQL.format(bks="bks")} AS cnts
      FROM b
    ), cell AS (
      SELECT (lang = 'en') AS t, unnest(bks) AS bkt FROM b
    ), cnt AS (
      SELECT bkt, count(*)::DOUBLE AS n_all,
             sum(CASE WHEN t THEN 1 ELSE 0 END)::DOUBLE AS n_tgt
      FROM cell GROUP BY 1
    ), tots AS (SELECT sum(n_all) AS ta, sum(n_tgt) AS tt FROM cnt),
    grid AS (
      SELECT g.i, coalesce(c.n_all, 0) AS n_all,
             coalesce(c.n_tgt, 0) AS n_tgt
      FROM range(0, 64) g(i) LEFT JOIN cnt c ON c.bkt = g.i
    ), delta AS (
      SELECT list(round(ln((n_tgt + 1.0) / (tt + 64.0)) -
                        ln((n_all + 1.0) / (ta + 64.0)), 9) ORDER BY i) AS d
      FROM grid, tots GROUP BY ta, tt
    )
    SELECT doc_id, lang, source,
           round(list_sum([cnts[i] * d[i] for i in range(1, 65)]), 6)
             AS dsir_logratio
    FROM cv, delta
    WHERE lang <> 'en'
    ORDER BY dsir_logratio DESC, doc_id
    LIMIT 100
    """,
)
def x10_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — DSIR data selection (Xie et al. 2023, round 6): tilt the
    pool toward a target domain by hashed-unigram importance
    log-ratios, no training loop. Target = the ``lang='en'`` slice,
    raw = the whole corpus; the top-100 non-target documents by
    ``Σ_b n_b·(ln p_t(b) − ln p_r(b))`` are the ones importance
    resampling would keep. ONE counting scan builds both distributions
    (a 64-cell aggregate, collected driver-side), the weight pass is
    zero-shuffle codegen over a literal delta array, and the top-100
    folds into TakeOrderedAndProject — the corpus never shuffles.
    Full value-hash oracle; Python differential in
    ``tests/test_classify.py``."""
    from vectordb_migrator_spark.operators.classify import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    return (
        dsir_weights(
            docs, "text", F.col("lang") == "en", dim=_NB_DIM, alpha=1.0
        )
        .filter(F.col("lang") != "en")
        .select("doc_id", "lang", "source", "dsir_logratio")
        .orderBy(F.desc("dsir_logratio"), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------
# X9 — Johnson–Lindenstrauss sign-projection recall curve
# ---------------------------------------------------------------------


def _jl_recall_sql() -> str:
    """Oracle for x9_jl_recall — rebuilds the md5 ±1 sign matrix IN
    SQL (so the cross-engine reproducibility of the matrix itself is
    part of what the value hash certifies), projects corpus + probe,
    and unions one recall row per prefix dimension."""
    blocks, sels = [], []
    for d in (8, 16, 32):
        blocks.append(
            f"""
    t{d} AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               round(list_dot_product(pv[1:{d}], ppv[1:{d}]) /
                     (sqrt(list_dot_product(pv[1:{d}], pv[1:{d}])) *
                      sqrt(list_dot_product(ppv[1:{d}], ppv[1:{d}]))), 6)
                 AS s
        FROM pe, pr ORDER BY s DESC, vec_id LIMIT 10)
    ),
    r{d} AS (
      SELECT {d}::INT AS dim, round(count(*) / 10.0, 6) AS recall_at_10
      FROM t{d} JOIN truth USING (vec_id)
    )"""
        )
        sels.append(f"SELECT * FROM r{d}")
    return f"""
    WITH p AS (SELECT {_PROBE_SQL} AS pv),
    sm AS (
      SELECT j, list(CASE WHEN CAST(CONCAT('0x',
                       substr(md5('jl-' || j || '-' || i), 1, 8)) AS BIGINT)
                       % 2 = 0
                     THEN 1.0 ELSE -1.0 END ORDER BY i) AS srow
      FROM range(0, 32) a(j) CROSS JOIN range(0, 64) b(i)
      GROUP BY j
    ),
    smat AS (SELECT list(srow ORDER BY j) AS m FROM sm),
    pe AS (
      SELECT vec_id,
             [list_dot_product(embedding::DOUBLE[], m[j])
              for j in range(1, 33)] AS pv
      FROM embeddings, smat
    ),
    pr AS (
      SELECT [list_dot_product(p.pv, m[j]) for j in range(1, 33)] AS ppv
      FROM p, smat
    ),
    truth AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               round(list_dot_product(embedding::DOUBLE[], p.pv) /
                     (sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[])) *
                      sqrt(list_dot_product(p.pv, p.pv))), 6) AS s
        FROM embeddings, p ORDER BY s DESC, vec_id LIMIT 10)
    ),{','.join(blocks)}
    SELECT * FROM ({' UNION ALL '.join(sels)}) ORDER BY dim
    """


@query("x9_jl_recall", None)  # oracle attached below (computed)
def x9_jl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — the Johnson–Lindenstrauss recall curve (round 6): recall@10
    of ±1 sign-projection retrieval at 8/16/32 output dims against the
    full-dim truth — the DATA-INDEPENDENT twin of the Matryoshka and
    PCA curves (no fit pass at all, so it's the dimension-reduction
    floor any learned projection must beat; compare this table with
    ``x9_matryoshka_curve`` to price the MRL training run). The md5
    sign matrix is prefix-stable, so ONE codegen projection pass
    (:func:`~vectordb_migrator_spark.operators.decomposition.jl_project`,
    no Python workers) serves every narrower point via array slices;
    each ranking is its own TakeOrdered branch (3 narrow scans at
    diagnostic cadence — the matryoshka persist-once guidance applies);
    recall joins are 10-row frames. The oracle rebuilds the SAME sign
    matrix in SQL, certifying the matrix construction cross-engine."""
    from vectordb_migrator_spark.functions.vector import cosine_similarity
    from vectordb_migrator_spark.operators.decomposition import (
        jl_project,
        jl_sign_matrix,
    )
    from vectordb_migrator_spark.operators.similarity import probe_literal

    probe = _probe_vector(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    proj = jl_project(
        emb, vec_col="embedding", out_dim=32, in_dim=len(probe), out_col="pv"
    )
    ppv = [
        sum(s * x for s, x in zip(row, probe))
        for row in jl_sign_matrix(32, len(probe))
    ]
    truth = (
        emb.select(
            "vec_id",
            F.round(
                cosine_similarity(
                    F.col("embedding").cast("array<double>"),
                    probe_literal(probe),
                ),
                6,
            ).alias("s"),
        )
        .orderBy(F.desc("s"), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    rows = []
    for d in (8, 16, 32):
        cand = (
            proj.select(
                "vec_id",
                F.round(
                    cosine_similarity(
                        F.slice(F.col("pv"), 1, d), probe_literal(ppv[:d])
                    ),
                    6,
                ).alias("s"),
            )
            .orderBy(F.desc("s"), "vec_id")
            .limit(10)
            .select("vec_id")
        )
        rows.append(
            cand.join(truth, "vec_id", "left_semi").agg(
                F.lit(d).cast("int").alias("dim"),
                F.round(F.count(F.lit(1)) / 10.0, 6).alias("recall_at_10"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("dim")


ORACLES["x9_jl_recall"] = _jl_recall_sql()


@query(
    "x3_entity_resolution",
    r"""
    WITH dirty AS (
      SELECT c_custkey AS d_key,
             substr(c_name, 1, p - 1)
               || cast((cast(substr(c_name, p, 1) AS INT) + 1) % 10
                       AS VARCHAR)
               || substr(c_name, p + 1) AS d_name
      FROM (SELECT c_custkey, c_name,
                   cast(15 + c_custkey % 4 AS INT) AS p
            FROM customer)
    ),
    clean AS (SELECT c_custkey AS c_key, c_name FROM customer),
    cand AS (
      SELECT DISTINCT d_key, c_key FROM (
        SELECT d.d_key, c.c_key FROM dirty d JOIN clean c
          ON substr(d.d_name, 15, 2) = substr(c.c_name, 15, 2)
        UNION ALL
        SELECT d.d_key, c.c_key FROM dirty d JOIN clean c
          ON substr(d.d_name, 17, 2) = substr(c.c_name, 17, 2)
      )
    ),
    pairs AS (
      SELECT cand.d_key, cand.c_key,
             levenshtein(d.d_name, c.c_name)::BIGINT AS dist
      FROM cand
      JOIN dirty d ON cand.d_key = d.d_key
      JOIN clean c ON cand.c_key = c.c_key
      WHERE levenshtein(d.d_name, c.c_name) <= 1
    ),
    best AS (
      SELECT d_key, c_key, dist FROM (
        SELECT d_key, c_key, dist,
               row_number() OVER (PARTITION BY d_key
                                  ORDER BY dist, c_key) AS rn
        FROM pairs)
      WHERE rn = 1
    )
    SELECT count(*)::BIGINT AS n_dirty,
           count(b.c_key)::BIGINT AS matched,
           sum(CASE WHEN b.c_key = d.d_key THEN 1 ELSE 0 END)::BIGINT
             AS correct,
           sum(CASE WHEN b.dist = 0 THEN 1 ELSE 0 END)::BIGINT
             AS exact_collisions
    FROM dirty d LEFT JOIN best b ON d.d_key = b.d_key
    """,
)
def x3_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — entity resolution via multi-pass-blocked fuzzy join
    (round 6): re-key a deterministically corrupted customer roster
    (one digit of the name's numeric tail substituted, position keyed
    by custkey) back to the canonical table. Candidates come from the
    UNION of two equi-join blocking passes on disjoint 2-digit
    windows of the tail — the corruption hits exactly one window, so
    the other is always intact: the textbook multi-pass recall
    guarantee, with zero cross joins (plan-locked). Levenshtein runs
    JVM-side on blocked candidates only; the match table stays
    id-width; best-match is a candidate-sized window with a
    deterministic (dist, id) tie-break. `correct < matched` is real
    ER behavior: a corrupted tail can collide exactly with another
    live key (`exact_collisions` counts those dist-0 traps). At
    100 TB the blocking NDV is the caller's knob — these 2-digit
    windows are sf-appropriate; a production roster keys on wider
    windows or phonetic codes via the same
    :func:`~vectordb_migrator_spark.operators.linkage.fuzzy_join`
    API."""
    from vectordb_migrator_spark.operators.linkage import (
        best_match,
        fuzzy_join,
    )

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    dirty = cust.withColumn(
        "p", (F.lit(15) + F.col("c_custkey") % 4).cast("int")
    ).select(
        F.col("c_custkey").alias("d_key"),
        F.expr(
            "substr(c_name, 1, p - 1)"
            " || cast((cast(substr(c_name, p, 1) as int) + 1) % 10"
            "         as string)"
            " || substr(c_name, p + 1)"
        ).alias("d_name"),
    )
    clean = cust.select(
        F.col("c_custkey").alias("c_key"), F.col("c_name")
    )
    pairs = fuzzy_join(
        dirty,
        clean,
        on=("d_name", "c_name"),
        block_keys=[
            (
                F.expr("substr(d_name, 15, 2)"),
                F.expr("substr(c_name, 15, 2)"),
            ),
            (
                F.expr("substr(d_name, 17, 2)"),
                F.expr("substr(c_name, 17, 2)"),
            ),
        ],
        left_id="d_key",
        right_id="c_key",
        max_dist=1,
    )
    best = best_match(pairs, left_id="d_key", right_id="c_key")
    return (
        dirty.select("d_key")
        .join(best, "d_key", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dirty"),
            F.count("c_key").cast("long").alias("matched"),
            F.sum(
                F.when(F.col("c_key") == F.col("d_key"), 1).otherwise(0)
            )
            .cast("long")
            .alias("correct"),
            F.sum(F.when(F.col("dist") == 0, 1).otherwise(0))
            .cast("long")
            .alias("exact_collisions"),
        )
    )


@query(
    "x12_skew_advisor",
    r"""
    WITH unp AS (
      SELECT 'events.user_id' AS key_col, user_id::VARCHAR AS k
        FROM events
      UNION ALL
      SELECT 'lineitem.l_suppkey', l_suppkey::VARCHAR FROM lineitem
      UNION ALL
      SELECT 'orders.o_custkey', o_custkey::VARCHAR FROM orders
    ),
    counts AS (
      SELECT key_col, k, count(*)::BIGINT AS n
      FROM unp GROUP BY key_col, k
    ),
    stats AS (
      SELECT key_col,
             count(*)::BIGINT AS ndv,
             sum(n)::BIGINT AS total,
             max(n)::BIGINT AS max_n,
             quantile_cont(n, 0.99) AS p99
      FROM counts GROUP BY key_col
    )
    SELECT key_col, ndv, total, max_n,
           round(p99, 6) AS p99_n,
           round(max_n / p99, 6) AS skew_ratio,
           (CASE WHEN max_n / p99 > 4.0
                 THEN least(64, greatest(1, ceil(max_n / p99)))
                 ELSE 1 END)::BIGINT AS salt
    FROM stats ORDER BY key_col
    """,
)
def x12_skew_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — join-key skew advisor (round 6): the pre-shuffle audit
    that prices a 100 TB join BEFORE running it. For each prospective
    key: exact NDV, hottest-key count, exact p99 of the per-key count
    distribution, and the straggler signal ``skew_ratio = max/p99``;
    when it crosses the threshold the table recommends the concrete
    ``salt`` factor to hand :func:`~vectordb_migrator_spark.operators
    .scale.salted_join` (clamped — salting replicates the other
    side). Companion to ``x12_layout_advisor``: that one picks the
    storage layout, this one prices the runtime shuffle. One grouped
    count per key (map-side combined), then a rollup over key-count
    rows — the audit itself never shuffles payload columns."""
    from vectordb_migrator_spark.operators.scale import key_skew_stats

    return key_skew_stats(
        [
            ("events.user_id", _t(spark, sf_dir, "events"), "user_id"),
            (
                "lineitem.l_suppkey",
                _t(spark, sf_dir, "lineitem"),
                "l_suppkey",
            ),
            ("orders.o_custkey", _t(spark, sf_dir, "orders"), "o_custkey"),
        ]
    )


@query(
    "x4_maxsim_topk",
    r"""
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
             unnest([{'chunk_id': i - 1,
                      'chunk_text': array_to_string(
                        toks[(i-1)*24 + 1 : (i-1)*24 + 32], ' '),
                      'n_tokens': least(n - (i-1)*24, 32)}
                     for i in range(1, n_chunks + 1)]) AS ch
      FROM c
    ), feats AS (
      SELECT doc_id, ch.chunk_id AS chunk_id,
             [ch.n_tokens::DOUBLE,
              length(ch.chunk_text)::DOUBLE,
              length(regexp_replace(ch.chunk_text, '[^.,;:!?]', '', 'g'))
                ::DOUBLE,
              length(regexp_replace(ch.chunk_text, '[^0-9]', '', 'g'))
                ::DOUBLE] AS v
      FROM x
    ), q AS (
      SELECT chunk_id AS qid, v AS qv FROM feats WHERE doc_id = 0
    ), per_q AS (
      SELECT f.doc_id, q.qid,
             max(round(list_dot_product(f.v, q.qv) /
                       (sqrt(list_dot_product(f.v, f.v)) *
                        sqrt(list_dot_product(q.qv, q.qv))), 6)) AS m
      FROM feats f CROSS JOIN q
      GROUP BY f.doc_id, q.qid
    )
    SELECT doc_id,
           round(sum(m::DECIMAL(18,6))::DOUBLE, 6) AS maxsim
    FROM per_q GROUP BY doc_id
    ORDER BY maxsim DESC, doc_id LIMIT 10
    """,
)
def x4_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — late-interaction (ColBERT-style MaxSim) retrieval
    (round 6): documents scored by Σ over query sub-vectors of the
    max cosine against the doc's own sub-vector set — the multi-vector
    model single-vector cosine top-k can't express (a doc matching
    every query facet in DIFFERENT chunks outranks one matching one
    facet everywhere). Sub-vectors are the deterministic per-chunk
    feature vectors of the chunk pipeline (standing in for the stubbed
    token-embedding model, same contract as ``x9_chunk_feature_pool``);
    the query is doc 0's own chunk set — query-sized, broadcast. Plan:
    one narrow chunk pass, a broadcast nested-loop against |Q| rows
    (no corpus shuffle), then two id-width reductions ((doc, q) max →
    doc decimal-exact sum). At 100 TB the scorer runs over an ANN
    shortlist (see
    :func:`~vectordb_migrator_spark.operators.ranking.maxsim_topk`)."""
    from vectordb_migrator_spark.operators.chunking import chunk_text
    from vectordb_migrator_spark.operators.ranking import maxsim_topk

    d = _t(spark, sf_dir, "documents")
    chunks = chunk_text(d, chunk_size=32, overlap=8)
    feats = chunks.select(
        "doc_id",
        "chunk_id",
        F.array(
            F.col("n_tokens").cast("double"),
            F.length("chunk_text").cast("double"),
            F.length(F.regexp_replace("chunk_text", r"[^.,;:!?]", "")).cast(
                "double"
            ),
            F.length(F.regexp_replace("chunk_text", r"[^0-9]", "")).cast(
                "double"
            ),
        ).alias("v"),
    )
    q = feats.filter(F.col("doc_id") == 0).select(
        F.col("chunk_id").alias("q_id"), F.col("v").alias("qv")
    )
    return maxsim_topk(
        feats, q, id_col="doc_id", vec_col="v", k=10
    )


def _textrank_sql(n_iter: int = 10, d: float = 0.85) -> str:
    """Oracle for x5_textrank — adjacent-word co-occurrence edges,
    then the same unrolled engine-exact PageRank contract as
    ``_pagerank_sql`` (DECIMAL(28,18) sums, per-iteration round-12)."""
    sql = r"""
    WITH t AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), bi AS (
      SELECT unnest([{'a': toks[i], 'b': toks[i+1]}
                     for i in range(1, len(toks))]) AS u
      FROM t WHERE len(toks) >= 2
    ), pr AS (
      SELECT DISTINCT least(u.a, u.b) AS a, greatest(u.a, u.b) AS b
      FROM bi WHERE u.a <> u.b
    ), edges AS (
      SELECT a, b FROM pr UNION SELECT b, a FROM pr
    ), verts AS (
      SELECT DISTINCT a AS id FROM edges
    ), deg AS (
      SELECT a AS id, count(*)::BIGINT AS deg FROM edges GROUP BY a
    ), nn AS (
      SELECT count(*)::DOUBLE AS n FROM verts
    ), r0 AS (
      SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM verts
    )"""
    for k in range(1, n_iter + 1):
        sql += f""", r{k} AS (
      SELECT v.id,
             round((1.0 - {d}) / (SELECT n FROM nn)
                   + {d} * coalesce(s.s, 0.0), 12) AS rank
      FROM verts v LEFT JOIN (
        SELECT e.b AS id,
               sum((r.rank / dg.deg)::DECIMAL(28,18))::DOUBLE AS s
        FROM edges e
        JOIN r{k - 1} r ON e.a = r.id
        JOIN deg dg ON dg.id = e.a
        GROUP BY e.b) s ON s.id = v.id
    )"""
    return (
        sql
        + f"""
    SELECT id AS word, round(rank, 6) AS rank
    FROM r{n_iter}
    ORDER BY rank DESC, word LIMIT 20"""
    )


@query("x5_textrank", _textrank_sql())
def x5_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — TextRank keyword extraction (round 7): PageRank over the
    adjacent-word co-occurrence graph (Mihalcea & Tarau '04), top-20
    words by centrality — the unsupervised keyword ranking that,
    unlike ``x5_keywords``'s TF-IDF, rewards words that BRIDGE many
    contexts rather than words that are merely frequent. The word
    graph is a bigram distinct fold (vocabulary-sized however big
    the corpus); the rank loop reuses the fixed-iteration engine-
    exact PageRank (DECIMAL contribution sums, round-12 per
    iteration — operators/graph.py:pagerank), so even this iterative
    algorithm carries a full unrolled-SQL oracle."""
    from vectordb_migrator_spark.operators.graph import pagerank

    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    pairs = (
        d.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.filter(
                    F.zip_with(
                        F.col("t"),
                        F.slice(F.col("t"), 2, F.size("t")),
                        lambda a, b: F.when(
                            b.isNotNull() & (a != b),
                            F.struct(
                                F.least(a, b).alias("wa"),
                                F.greatest(a, b).alias("wb"),
                            ),
                        ),
                    ),
                    lambda s: s.isNotNull(),
                )
            ).alias("p")
        )
        .select("p.wa", "p.wb")
        .distinct()
    )
    ranks = pagerank(pairs, src="wa", dst="wb", undirected=True)
    return (
        ranks.select(
            F.col("id").alias("word"), F.round("rank", 6).alias("rank")
        )
        .orderBy(F.desc("rank"), "word")
        .limit(20)
    )


def _pagerank_sql(n_iter: int = 10, d: float = 0.85) -> str:
    """Oracle for x2_dedup_pagerank — the SAME near-dup pair graph as
    x2_dedup_clusters, then ``n_iter`` UNROLLED PageRank iterations
    (one CTE each) with the engine-exactness contract the operator
    keeps: DECIMAL(28,18) contribution sums, per-iteration round-12."""
    sql = r"""
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
    ), verts AS (
      SELECT DISTINCT a AS id FROM edges
    ), deg AS (
      SELECT a AS id, count(*)::BIGINT AS deg FROM edges GROUP BY a
    ), nn AS (
      SELECT count(*)::DOUBLE AS n FROM verts
    ), r0 AS (
      SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM verts
    )"""
    for k in range(1, n_iter + 1):
        sql += f""", r{k} AS (
      SELECT v.id,
             round((1.0 - {d}) / (SELECT n FROM nn)
                   + {d} * coalesce(s.s, 0.0), 12) AS rank
      FROM verts v LEFT JOIN (
        SELECT e.b AS id,
               sum((r.rank / dg.deg)::DECIMAL(28,18))::DOUBLE AS s
        FROM edges e
        JOIN r{k - 1} r ON e.a = r.id
        JOIN deg dg ON dg.id = e.a
        GROUP BY e.b) s ON s.id = v.id
    )"""
    return (
        sql
        + f"""
    SELECT v.id, c.comp, round(r.rank, 6) AS rank,
           (CASE WHEN row_number() OVER (
                    PARTITION BY c.comp ORDER BY r.rank DESC, v.id) = 1
                 THEN 1 ELSE 0 END)::BIGINT AS canonical
    FROM verts v
    JOIN comp c ON c.id = v.id
    JOIN r{n_iter} r ON r.id = v.id
    ORDER BY v.id"""
    )


@query(
    "x2_triangle_counts",
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
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
      GROUP BY a.id, b.id
      HAVING count(*)::DOUBLE /
             (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE >= 0.2
    ), verts AS (
      SELECT DISTINCT id_a AS id FROM pairs
      UNION SELECT DISTINCT id_b FROM pairs
    ), tri AS (
      SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
      FROM pairs e1
      JOIN pairs e2 ON e1.id_a = e2.id_a AND e1.id_b < e2.id_b
      JOIN pairs e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b
    ), pv AS (
      SELECT v AS id, count(*)::BIGINT AS triangles
      FROM (SELECT unnest([a, b, c]) AS v FROM tri)
      GROUP BY v
    )
    SELECT verts.id, coalesce(pv.triangles, 0)::BIGINT AS triangles
    FROM verts LEFT JOIN pv ON pv.id = verts.id
    ORDER BY verts.id
    """,
)
def x2_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — per-vertex triangle counts over the SAME near-dup pair
    graph as ``x2_dedup_clusters`` (round 7): the dup-family SHAPE
    signal — a family rich in triangles is a true clique (safe
    keep-one dedup), a triangle-free chain means the threshold is
    linking marginal pairs transitively. Degree-oriented wedge join
    (Suri & Vassilvitskii WWW'11): edges orient small→large (deg, id)
    per-edge against the degree table — no global rank window — so
    wedge volume is Σ min-degree and hub skew never concentrates on
    one reducer; id/degree longs are the only shuffle payload
    (operators/graph.py:triangle_counts). The oracle counts the same
    triangles with the naive id-ordered join (orientation changes the
    work, never the triangle set)."""
    from vectordb_migrator_spark.operators.graph import triangle_counts

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2
    )
    return triangle_counts(pairs)


@query(
    "x2_clustering_coefficient",
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
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
      GROUP BY a.id, b.id
      HAVING count(*)::DOUBLE /
             (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE >= 0.2
    ), tri AS (
      SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
      FROM pairs e1
      JOIN pairs e2 ON e1.id_a = e2.id_a AND e1.id_b < e2.id_b
      JOIN pairs e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b
    ), pv AS (
      SELECT v AS id, count(*)::BIGINT AS triangles
      FROM (SELECT unnest([a, b, c]) AS v FROM tri)
      GROUP BY v
    ), deg AS (
      SELECT id, count(*)::BIGINT AS deg FROM (
        SELECT id_a AS id FROM pairs
        UNION ALL SELECT id_b FROM pairs
      ) GROUP BY id
    ), per AS (
      SELECT d.id, coalesce(pv.triangles, 0) AS t, d.deg,
             d.deg * (d.deg - 1) / 2.0 AS w
      FROM deg d LEFT JOIN pv ON pv.id = d.id
    )
    SELECT count(*)::BIGINT AS n_vertices,
           sum(CASE WHEN deg >= 2 THEN 1 ELSE 0 END)::BIGINT
             AS n_eligible,
           round(avg(CASE WHEN deg >= 2 THEN t / w END), 6)
             AS avg_local_cc,
           round(sum(t)::DOUBLE
                 / nullif(sum(CASE WHEN deg >= 2 THEN w
                              ELSE 0 END), 0), 6) AS global_cc
    FROM per
    """,
)
def x2_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — clustering-coefficient summary of the near-dup graph
    (round 7): average local coefficient and global transitivity over
    the SAME pair graph as ``x2_triangle_counts`` — the small-world
    readout that says whether dup families are tight cliques (high cc
    → keep-one dedup is safe) or straggly transitive chains (low cc →
    the threshold links marginal pairs). Reuses the degree-oriented
    skew-safe wedge join; coefficient math folds on the per-vertex
    frame (operators/graph.py:clustering_coefficient). Full oracle."""
    from vectordb_migrator_spark.operators.graph import (
        clustering_coefficient,
    )

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2
    ).localCheckpoint(eager=True)
    return clustering_coefficient(pairs)


@query(
    "x2_graph_stats",
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
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
      GROUP BY a.id, b.id
      HAVING count(*)::DOUBLE /
             (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE >= 0.2
    ), e AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ), deg AS (
      SELECT u AS id, count(*)::DOUBLE AS d FROM e GROUP BY u
    ), j AS (
      SELECT du.d AS x, dv.d AS y
      FROM e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v
    ), s AS (
      SELECT count(*)::DOUBLE AS m, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM j
    ), vv AS (
      SELECT count(*)::DOUBLE AS nv, sum(d) AS sumd FROM deg
    )
    SELECT nv::BIGINT AS n_vertices,
           (m / 2)::BIGINT AS n_edges,
           round(sumd / nv, 6) AS avg_degree,
           round(m / (nv * (nv - 1)), 6) AS density,
           round((m * sxy - sx * sy)
                 / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)),
                 6) AS assortativity
    FROM s, vv
    """,
)
def x2_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — one-row shape summary of the near-dup graph (round 7):
    vertex/edge counts, mean degree, density, and Newman's degree
    assortativity (Pearson correlation of endpoint degrees over the
    symmetrized edge list). The interpretation layer for the whole
    dedup-graph family: assortativity near +1 means hubs link hubs
    (template families that should dedup as blocks), strongly negative
    means star-shaped families around one canonical doc (threshold
    drift risk — exactly where ``x2_kcore``'s peel and the triangle
    diagnostic disagree most). Scale shape: one degree aggregate, a
    degree join carrying (long, double) rows, and a single
    moment-sums reduce — closed-form Pearson, no second pass;
    round-6 after the sums absorbs engine addition-order drift."""
    # materialize the (tiny) near-dup pair set once: the lazy frame is
    # referenced by the symmetrize union AND both sides of the degree
    # join, re-executing the corpus-sized shingle join per reference
    # (r13; measured 5.2 -> 3.0 s warm, values identical)
    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2
    ).localCheckpoint(eager=True)
    e = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    deg = e.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    j = (
        e.join(deg.select(F.col("id").alias("u"), F.col("d").alias("x")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("d").alias("y")), "v")
        .select("x", "y")
    )
    s = j.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vv = deg.agg(
        F.count(F.lit(1)).cast("double").alias("nv"),
        F.sum("d").alias("sumd"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.crossJoin(vv).select(
        F.col("nv").cast("long").alias("n_vertices"),
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.round(F.col("sumd") / F.col("nv"), 6).alias("avg_degree"),
        F.round(F.col("m") / (F.col("nv") * (F.col("nv") - 1)), 6).alias(
            "density"
        ),
        F.round(num / F.sqrt(dxx * dyy), 6).alias("assortativity"),
    )


def _kcore_sql(k: int = 2, n_iter: int = 10) -> str:
    """Oracle for x2_kcore — the SAME near-dup pair graph as
    x2_dedup_clusters, then ``n_iter`` UNROLLED peel iterations (one
    degree CTE + one induced-subgraph CTE each). Peeling is monotone,
    so the operator's early-stop-on-convergence result equals this
    fixed unroll exactly."""
    sql = r"""
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
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
      GROUP BY a.id, b.id
      HAVING count(*)::DOUBLE /
             (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE >= 0.2
    ), e0 AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
    )"""
    for i in range(n_iter):
        sql += f""", d{i} AS MATERIALIZED (
      SELECT id, count(*)::BIGINT AS deg
      FROM (SELECT u AS id FROM e{i} UNION ALL SELECT v FROM e{i})
      GROUP BY id
    ), e{i + 1} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{i} e
      JOIN d{i} a ON a.id = e.u AND a.deg >= {k}
      JOIN d{i} b ON b.id = e.v AND b.deg >= {k}
    )"""
    sql += f"""
    SELECT id, count(*)::BIGINT AS deg
    FROM (SELECT u AS id FROM e{n_iter} UNION ALL SELECT v FROM e{n_iter})
    GROUP BY id HAVING count(*) >= {k}
    ORDER BY id"""
    return sql


@query("x2_kcore", _kcore_sql())
def x2_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — 2-core of the near-dup pair graph (round 7): the density
    filter that ACTS on what ``x2_triangle_counts`` diagnoses — the
    2-core keeps exactly the vertices on a cycle (genuinely
    mutually-duplicated families), peeling away the chains and
    isolated pairs that only link marginal near-dup pairs
    transitively, so a "delete all non-canonicals" policy can be
    restricted to families where the duplication evidence is mutual.
    Iterative peel, up to 10 rounds: per round one id-only degree
    aggregate + two semi-joins of the (long,long) edge list against
    the surviving vertex set; ``localCheckpoint`` truncates lineage
    and an O(1) count stops the loop once a round removes nothing —
    which is exactly when the result equals the oracle's fixed
    10-iteration unroll (extra peels are no-ops on a stable graph).
    Rounds = peel depth, independent of graph size
    (operators/graph.py:kcore)."""
    from vectordb_migrator_spark.operators.graph import kcore

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2
    )
    return kcore(pairs, k=2, n_iter=10)


@query("x2_dedup_pagerank", _pagerank_sql())
def x2_dedup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — centrality-keeper dedup (round 6): PageRank over the SAME
    near-dup pair graph as ``x2_dedup_clusters``, composed with the
    component assignment — per dup family, the member every
    near-duplicate 'points at' hardest is flagged canonical (the
    graph-importance alternative to the quality-argmax of
    ``x2_dedup_keep_best``: no quality model needed, ties in dense
    families resolved by structure). The 10 fixed iterations round
    each rank to 12 with DECIMAL contribution sums, making an
    ITERATIVE distributed algorithm exactly reproducible in SQL — the
    oracle unrolls one CTE per iteration and hash-matches. The pair
    frame is localCheckpointed once and feeds both PageRank and the
    CC closure; every loop shuffle is (long, double)-width
    (operators/graph.py:pagerank)."""
    from vectordb_migrator_spark.operators.graph import (
        connected_components,
        pagerank,
    )

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2
    ).localCheckpoint(eager=True)
    pr = pagerank(pairs)
    comp = connected_components(pairs)
    w = W.partitionBy("comp").orderBy(F.desc("rank"), "id")
    return (
        comp.join(pr, "id")
        .withColumn(
            "canonical",
            F.when(F.row_number().over(w) == 1, 1).otherwise(0).cast("long"),
        )
        .select("id", "comp", F.round("rank", 6).alias("rank"), "canonical")
        .orderBy("id")
    )


@query(
    "x5_isotonic_calibration",
    # PAV is sequential, but its SOLUTION has the closed minimax form
    # fitted_i = max_{j<=i} min_{k>=i} wavg(j..k) (isotonic regression
    # is a unique projection; level-set runs = the PAV pools, and the
    # stack's >=-merge likewise fuses equal-mean neighbors). With
    # integer (pos, n) prefix sums every interval average is an exact
    # rational whose double is correctly rounded, so min/max over the
    # doubles equals the double of the exact minimax — engine-exact.
    # O(n²) interval pairs over ~300 distinct scores: trivial.
    r"""
    WITH pts AS (
      SELECT round(value / 100.0, 2)::DOUBLE AS s,
             sum(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END)::DOUBLE AS pos,
             count(*)::DOUBLE AS n
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1
    ), idx AS (
      SELECT s, pos, n, row_number() OVER (ORDER BY s) AS i FROM pts
    ), pre AS (
      SELECT i, s, pos, n,
             sum(pos) OVER (ORDER BY i) AS cp,
             sum(n) OVER (ORDER BY i) AS cn
      FROM idx
    ), avgjk AS (
      SELECT a.i AS j, b.i AS k,
             (b.cp - (a.cp - a.pos)) / (b.cn - (a.cn - a.n)) AS av
      FROM pre a JOIN pre b ON b.i >= a.i
    ), mn AS (
      SELECT j, k AS i,
             min(av) OVER (PARTITION BY j ORDER BY k DESC) AS m
      FROM avgjk
    ), fit AS (
      SELECT i, max(m) AS f FROM mn GROUP BY i
    ), runs AS (
      SELECT f.i, f.f, p.s, p.n,
             sum(CASE WHEN f.pf IS NULL OR f.pf <> f.f
                      THEN 1 ELSE 0 END) OVER (ORDER BY f.i) AS grp
      FROM (SELECT i, f, lag(f) OVER (ORDER BY i) AS pf FROM fit) f
      JOIN idx p USING (i)
    )
    SELECT min(s) AS score_lo,
           max(s) AS score_hi,
           round(max(f), 6) AS p,
           sum(n)::BIGINT AS n
    FROM runs GROUP BY grp ORDER BY score_lo
    """,
)
def x5_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — isotonic (PAV) score calibration (round 7): pool-adjacent-
    violators over per-distinct-score positive rates turns any score
    into a monotone probability — the nonparametric repair step for a
    confident-but-wrong classifier, next to ``x5_nb_calibration``'s
    reliability DIAGNOSIS. Here the event value (quantized to cents of
    its 0-100 range) calibrates against purchase membership; the
    output is the step function a serving layer broadcasts. The
    corpus folds to one distinct-score aggregate; PAV runs driver-side
    on that model-sized frame (the k-means-centroids contract)
    (operators/classify.py:isotonic_calibrate). FULL oracle as of
    round 9: DuckDB replays the solution via the exact minimax closed
    form (see the SQL header comment) — the sequential stack was the
    algorithm, not the semantics."""
    from vectordb_migrator_spark.operators.classify import (
        isotonic_calibrate,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") / 100.0, 2).alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("lab"),
    )
    model = isotonic_calibrate(ev, score_col="score", label_col="lab")
    return spark.createDataFrame(
        [
            (m["score_lo"], m["score_hi"], m["p"], m["n"])
            for m in model
        ],
        "score_lo double, score_hi double, p double, n long",
    ).orderBy("score_lo")


@query(
    "x5_nb_calibration",
    rf"""
    WITH b AS (
      SELECT doc_id, lang, {_FHB64_SQL.format(col="text")} AS bks
      FROM documents
    ), cv AS (
      SELECT doc_id, lang, {_CNT64_SQL.format(bks="bks")} AS cnts FROM b
    ), cell AS (
      SELECT lang AS label, unnest(bks) AS bkt FROM b
    ), cnt AS (
      SELECT label, bkt, count(*)::DOUBLE AS n FROM cell GROUP BY 1, 2
    ), tot AS (
      SELECT label, sum(n) AS tot FROM cnt GROUP BY 1
    ), grid AS (
      SELECT t.label, g.i, t.tot, coalesce(c.n, 0) AS n
      FROM tot t CROSS JOIN range(0, 64) g(i)
      LEFT JOIN cnt c ON c.label = t.label AND c.bkt = g.i
    ), ll AS (
      SELECT label,
             list(round(ln((n + 1.0) / (tot + 64.0)), 9) ORDER BY i) AS ll
      FROM grid GROUP BY label
    ), prior AS (
      SELECT lang AS label,
             round(ln(count(*)::DOUBLE /
                      (SELECT count(*) FROM documents)), 9) AS lp
      FROM documents GROUP BY 1
    ), sc AS (
      SELECT cv.doc_id, cv.lang, l.label,
             round(p.lp + list_sum(
               [cv.cnts[i] * l.ll[i] for i in range(1, 65)]), 6) AS score
      FROM cv CROSS JOIN ll l JOIN prior p ON p.label = l.label
    ), smax AS (
      SELECT *,
             max(score) OVER (PARTITION BY doc_id) AS smax,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, label DESC) AS rn
      FROM sc
    ), cf AS (
      SELECT doc_id,
             round(1.0 / list_sum(
               list(exp(score - smax) ORDER BY label)), 6) AS conf
      FROM smax GROUP BY doc_id
    ), post AS (
      SELECT s.doc_id, s.lang, s.label AS pred, c.conf
      FROM smax s JOIN cf c ON c.doc_id = s.doc_id
      WHERE s.rn = 1
    ), binned AS (
      SELECT least(9, floor(conf * 10))::BIGINT AS bin,
             conf,
             CASE WHEN pred = lang THEN 1 ELSE 0 END AS ok
      FROM post
    )
    SELECT bin, count(*)::BIGINT AS n,
           round(sum(conf::DECIMAL(18,6))::DOUBLE / count(*), 6)
             AS mean_conf,
           round(sum(ok)::DOUBLE / count(*), 6) AS accuracy
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def x5_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — classifier calibration audit (round 6): the reliability
    diagram for the hashed-unigram NB language classifier — softmax
    confidence of the winning label, binned into deciles, against the
    observed accuracy in each bin. The table a curation pipeline
    reads before TRUSTING classifier scores as mixture weights or
    filter thresholds (a confident-but-wrong bin means the threshold
    must move, or the scores need temperature scaling — the |conf −
    acc| gap per bin is the ECE integrand). Same two-scan shape as
    the classifier itself (kilobyte model collect → zero-shuffle
    codegen scoring); the posterior is an ordered label fold so the
    double math is engine-exact, and per-bin means sum as DECIMAL.
    The confusion-matrix twin is ``x5_langid_confusion``; this query
    grades the SCORES, that one grades the argmax."""
    from vectordb_migrator_spark.operators.classify import nb_fit, nb_score

    docs = _t(spark, sf_dir, "documents")
    model = nb_fit(docs, "text", "lang", dim=_NB_DIM, alpha=1.0)
    scored = nb_score(
        docs, model, "text", dim=_NB_DIM, posterior_col="conf"
    )
    binned = scored.select(
        F.least(F.lit(9), F.floor(F.col("conf") * 10))
        .cast("long")
        .alias("bin"),
        "conf",
        F.when(F.col("pred") == F.col("lang"), 1).otherwise(0).alias("ok"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.col("conf").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_conf"),
            F.round(F.sum("ok") / F.count(F.lit(1)), 6).alias("accuracy"),
        )
        .orderBy("bin")
    )


@query(
    "x13_winsorize_events",
    r"""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS lo,
             quantile_cont(value, 0.99) AS hi
      FROM events GROUP BY event_type
    ), w AS (
      SELECT e.event_type, e.value, q.lo, q.hi,
             least(greatest(e.value, q.lo), q.hi) AS wv
      FROM events e JOIN q ON q.event_type = e.event_type
    )
    SELECT event_type,
           count(*)::BIGINT AS n,
           round(any_value(lo), 6) AS p01,
           round(any_value(hi), 6) AS p99,
           sum(CASE WHEN value < lo THEN 1 ELSE 0 END)::BIGINT
             AS n_clipped_lo,
           sum(CASE WHEN value > hi THEN 1 ELSE 0 END)::BIGINT
             AS n_clipped_hi,
           round(sum(value::DECIMAL(25,10))::DOUBLE / count(*), 6)
             AS mean_raw,
           round(sum(wv::DECIMAL(25,10))::DOUBLE / count(*), 6)
             AS mean_winsor
    FROM w GROUP BY event_type ORDER BY event_type
    """,
)
def x13_winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — per-group winsorization (round 6): clamp each event
    type's value to its exact [p01, p99] band and report how much the
    tails moved the mean — the robust-statistics companion to
    ``anomaly_zscore_events`` (z-scores FLAG outliers; winsorizing
    BOUNDS their influence so downstream feature means aren't owned
    by one fat-fingered row). Two passes: a per-type exact-percentile
    aggregate (tiny frame, broadcast back) and one clamp-and-
    aggregate scan with DECIMAL-exact means — the same
    two-scans-beat-one-giant-window shape the timeseries family
    documents. At 100 TB swap the exact percentile for
    ``approx_percentile`` at the documented error; the clamp pass is
    unchanged."""
    ev = _t(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("lo"),
        F.expr("percentile(value, 0.99)").alias("hi"),
    )
    w = ev.join(F.broadcast(q), "event_type").withColumn(
        "wv", F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    )
    return (
        w.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first("lo"), 6).alias("p01"),
            F.round(F.first("hi"), 6).alias("p99"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_lo"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_hi"),
            F.round(
                F.sum(F.col("value").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_raw"),
            F.round(
                F.sum(F.col("wv").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_winsor"),
        )
        .orderBy("event_type")
    )


@query("x9_whitening_check", None)  # NumPy-differential, rows-only
def x9_whitening_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — ZCA whitening certificate (round 6): fit the whitener
    from ONE Gram sufficient-statistics pass (O(d²) driver math, same
    contract as ``x9_pca_evr``), apply it Arrow-batched, then verify
    distributively that the whitened covariance is the identity — a
    SECOND Gram pass over the whitened vectors whose diagonal must be
    1 and off-diagonal mass 0. Output: per leading dimension, the
    whitened mean (→0), variance (→1), and the max |off-diagonal|
    covariance in its row (→0) — the certificate a retrieval pipeline
    wants before trusting whitened cosine scores. Eigendecomposition
    is NumPy-on-the-driver (model-sized); no SQL oracle exists for an
    eigenproblem, so the driver row is rows-only and the exactness
    evidence is the NumPy differential at
    tests/test_decomposition.py."""
    from vectordb_migrator_spark.operators.decomposition import (
        gram_matrix,
        whiten_vectors,
        whitening_fit,
    )

    emb = _t(spark, sf_dir, "embeddings")
    gram, colsum, n = gram_matrix(emb, vec_col="embedding")
    w, mu = whitening_fit(gram, colsum, n)
    wh = whiten_vectors(emb, w, mu, vec_col="embedding")
    g2, s2, n2 = gram_matrix(wh, vec_col="whitened")
    mu2 = s2 / n2
    cov2 = g2 / n2 - np.outer(mu2, mu2)
    off = np.abs(cov2 - np.diag(np.diag(cov2)))
    rows = [
        (
            int(i),
            float(round(mu2[i], 4)) + 0.0,
            float(round(cov2[i, i], 4)) + 0.0,
            float(round(off[i].max(), 4)) + 0.0,
        )
        for i in range(8)
    ]
    return spark.createDataFrame(
        rows, "dim int, mean double, variance double, max_offdiag double"
    )
