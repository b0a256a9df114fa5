"""Registry family ``s10_round8_b`` — round-8 queries (second half:
layout, trends, statistics batteries, profiling, quantization)."""

from __future__ import annotations

# ruff: noqa: E501
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.dedup import ngram_jaccard_pairs
from vectordb_migrator_spark.suite._shared import _t, query
from vectordb_migrator_spark.suite.s10_round8_a import (
    _CDC_CHUNKS_CTE,
    _NGRAM_PAIRS_CTE,
)

def _zorder_layout_sql() -> str:
    """Oracle for x12_zorder_layout: exact integer min-max bucketing,
    the same bit-interleave as scale.zorder_value (bit i of column j
    at position i·N+j), ntile chunking with the unique tie-break."""
    layouts = [
        ("linear_orderkey", "ok"),
        ("linear_partkey", "val"),
        ("zorder", "zv"),
    ]
    parts = []
    for label, oc in layouts:
        parts.append(f"""
      SELECT '{label}' AS layout,
             count(*)::BIGINT AS n_chunks,
             sum(CASE WHEN hit THEN 1 ELSE 0 END)::BIGINT AS chunks_hit,
             round(1 - sum(CASE WHEN hit THEN 1 ELSE 0 END)::DOUBLE
                       / count(*), 6) AS prune_rate,
             sum(CASE WHEN hit THEN rows ELSE 0 END)::BIGINT
               AS rows_scanned,
             sum(matching)::BIGINT AS rows_matching,
             round(sum(matching)::DOUBLE
                   / nullif(sum(CASE WHEN hit THEN rows ELSE 0 END), 0),
                   6) AS scan_efficiency
      FROM (
        SELECT mx >= (SELECT lo FROM p) AND mn <= (SELECT hi FROM p)
                 AS hit, rows, matching
        FROM (
          SELECT min(val) AS mn, max(val) AS mx,
                 count(*)::BIGINT AS rows,
                 sum(CASE WHEN val BETWEEN (SELECT lo FROM p)
                                       AND (SELECT hi FROM p)
                     THEN 1 ELSE 0 END)::BIGINT AS matching
          FROM (
            SELECT ntile(64) OVER (ORDER BY {oc}, tb) AS chunk, val
            FROM z
          ) GROUP BY chunk
        )
      )""")
    return (
        """
    WITH b AS (
      SELECT min(l_orderkey) AS xmn, max(l_orderkey) AS xmx,
             min(l_partkey) AS ymn, max(l_partkey) AS ymx
      FROM lineitem
    ), p AS (
      SELECT ymn + (ymx - ymn) * 40 // 100 AS lo,
             ymn + (ymx - ymn) * 45 // 100 AS hi
      FROM b
    ), v AS (
      SELECT l_partkey AS val, l_orderkey AS ok,
             l_orderkey * 8 + l_linenumber AS tb,
             ((l_orderkey - xmn) * 256) // (xmx - xmn + 1) AS bx,
             ((l_partkey - ymn) * 256) // (ymx - ymn + 1) AS by_
      FROM lineitem, b
    ), z AS (
      SELECT val, ok, tb,
             list_sum([((bx // (1 << i)) % 2) * (1 << (2 * i))
                       + ((by_ // (1 << i)) % 2) * (1 << (2 * i + 1))
                       for i in range(0, 8)]) AS zv
      FROM v
    )
    SELECT * FROM ("""
        + " UNION ALL ".join(parts)
        + ") ORDER BY layout"
    )


@query("x12_zorder_layout", _zorder_layout_sql())
def x12_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — the z-order WHAT-IF (round 8): does one Morton-curve
    sort buy zone-map pruning on BOTH join keys? Bucket l_orderkey ×
    l_partkey into 256×256 cells with exact integer min-max scaling,
    interleave via the existing ``zorder_value`` kernel, and run the
    same 64-chunk zone-map simulation as ``x12_zonemap_prune`` for a
    ~5% l_partkey band under three layouts: linear-by-orderkey
    (prunes ~nothing for this predicate), linear-by-partkey (prunes
    best but sacrifices orderkey locality), and the z-curve (most of
    the partkey pruning while preserving orderkey clustering — the
    measured case for OPTIMIZE ZORDER before rewriting 100 TB).
    Bounds and band edges are exact integer formulas, so the full
    report carries a value-hash oracle
    (operators/scale.py:zorder_value, zonemap_prune_report)."""
    from vectordb_migrator_spark.operators.scale import (
        zonemap_prune_report,
        zorder_value,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    b = li.agg(
        F.min("l_orderkey").alias("xmn"),
        F.max("l_orderkey").alias("xmx"),
        F.min("l_partkey").alias("ymn"),
        F.max("l_partkey").alias("ymx"),
    ).first()
    xmn, xmx, ymn, ymx = b["xmn"], b["xmx"], b["ymn"], b["ymx"]
    lo = ymn + (ymx - ymn) * 40 // 100
    hi = ymn + (ymx - ymn) * 45 // 100
    bx = F.floor(
        ((F.col("l_orderkey").cast("long") - F.lit(xmn)) * F.lit(256))
        / F.lit(xmx - xmn + 1)
    ).cast("long")
    by = F.floor(
        ((F.col("l_partkey").cast("long") - F.lit(ymn)) * F.lit(256))
        / F.lit(ymx - ymn + 1)
    ).cast("long")
    df = (
        li.withColumn("__bx", bx)
        .withColumn("__by", by)
        .withColumn("__z", zorder_value(["__bx", "__by"], bits=8))
        .withColumn(
            "__tb",
            F.col("l_orderkey").cast("long") * 8 + F.col("l_linenumber"),
        )
    )
    return zonemap_prune_report(
        df,
        value_col="l_partkey",
        lo=float(lo),
        hi=float(hi),
        layouts=[
            ("linear_orderkey", "l_orderkey"),
            ("linear_partkey", "l_partkey"),
            ("zorder", "__z"),
        ],
        tiebreak_col="__tb",
        n_chunks=64,
    )


@query(
    "x13_ols_trend",
    """
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             round(sum(round(value, 6)::DECIMAL(18,6)) / count(*), 6)
               AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), t AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', day)::DECIMAL(19,6)
               AS t6,
             v::DECIMAL(19,6) AS v6
      FROM d
    ), m AS (
      SELECT event_type, count(*)::BIGINT AS n,
             sum(t6)::DECIMAL(38,6) AS st,
             sum(v6)::DECIMAL(38,6) AS sv,
             sum(t6 * t6)::DECIMAL(38,12) AS stt,
             sum(t6 * v6)::DECIMAL(38,12) AS stv,
             sum(v6 * v6)::DECIMAL(38,12) AS svv
      FROM t GROUP BY 1
    ), c AS (
      SELECT event_type, n,
             n * stt::DOUBLE - st::DOUBLE * st::DOUBLE AS var_t,
             n * stv::DOUBLE - st::DOUBLE * sv::DOUBLE AS cov,
             n * svv::DOUBLE - sv::DOUBLE * sv::DOUBLE AS var_v,
             st::DOUBLE AS std, sv::DOUBLE AS svd
      FROM m
    )
    SELECT event_type, n,
           round(CASE WHEN n >= 2 AND var_t <> 0
                 THEN cov / var_t END, 6) AS slope,
           round(CASE WHEN n >= 2 AND var_t <> 0
                 THEN (svd - (cov / var_t) * std) / n END, 6)
             AS intercept,
           round(CASE WHEN n >= 2 AND var_t <> 0 AND var_v <> 0
                 THEN cov * cov / (var_t * var_v) END, 6) AS r2
    FROM c ORDER BY event_type
    """,
)
def x13_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — per-series OLS trend with R² (round 8): slope/intercept
    from the five classic moments in ONE map-side-combinable
    aggregate over the daily-mean frame — the exact/cheap complement
    of ``x13_theil_sen`` (pairwise-slope median): when the two slopes
    agree the trend is clean, when OLS is dragged away outlier days
    are steering it, and R² says how much of the series the line
    explains at all. Moments sum as exact decimals over round-6
    inputs (the corr_matrix contract), so the whole report is
    bit-reproducible cross-engine; t is the integer epoch-day index
    (operators/timeseries.py:ols_trend)."""
    from vectordb_migrator_spark.operators.timeseries import ols_trend

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.round(
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)"))
            / F.count(F.lit(1)),
            6,
        ).alias("v")
    )
    frame = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).alias(
            "t"
        ),
        "v",
    )
    return ols_trend(
        frame, t_col="t", value_col="v", group_cols=["event_type"]
    )


@query(
    "x5_pmi_collocations",
    r"""
    WITH t AS (
      SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), uni AS (
      SELECT u.w AS w, count(*)::BIGINT AS n_w
      FROM t, unnest(t.toks) u(w) GROUP BY 1
    ), big AS (
      SELECT t.toks[i] AS w1, t.toks[i + 1] AS w2,
             count(*)::BIGINT AS n_pair
      FROM t, unnest(range(1, len(t.toks))) u(i)
      GROUP BY 1, 2 HAVING count(*) >= 5
    ), nu AS (SELECT sum(n_w)::DOUBLE AS v FROM uni),
    nb AS (SELECT sum(greatest(len(toks) - 1, 0))::DOUBLE AS v FROM t)
    SELECT b.w1, b.w2, b.n_pair, a.n_w AS n_w1, c.n_w AS n_w2,
           round(log2((b.n_pair / (SELECT v FROM nb))
                      / ((a.n_w / (SELECT v FROM nu))
                         * (c.n_w / (SELECT v FROM nu)))), 6) AS pmi
    FROM big b JOIN uni a ON a.w = b.w1 JOIN uni c ON c.w = b.w2
    ORDER BY pmi DESC, b.w1, b.w2 LIMIT 30
    """,
)
def x5_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — PMI collocation mining (round 8): adjacent word pairs
    ranked by log2(p(pair)/(p(w1)·p(w2))) with the Church & Hanks
    min-count floor — the corpus's multiword units, feeding tokenizer
    vocab candidates, the phrase index, and boilerplate hunts. The
    complement of ``x5_bigram_surprisal``: that scores documents
    under a transition model, this ranks the transitions themselves.
    Bigrams form scan-side in codegen (array zipped with its shift);
    one bigram shuffle + one unigram shuffle, 1-row totals broadcast,
    TakeOrdered(30) on (round-6 PMI, pair) so ties rank
    engine-reproducibly (operators/cleaning.py:pmi_collocations)."""
    from vectordb_migrator_spark.operators.cleaning import pmi_collocations

    return pmi_collocations(
        _t(spark, sf_dir, "documents"), min_count=5, top_k=30
    )


@query(
    "x13_rfm_segments",
    """
    WITH b AS (
      SELECT user_id AS u, date_trunc('day', ts) AS d, value
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
    ), mx AS (SELECT max(d) AS v FROM b),
    pu AS (
      SELECT u,
             date_diff('day', max(d), (SELECT v FROM mx))::BIGINT AS r,
             count(*)::BIGINT AS f,
             round(sum(round(value, 6)::DECIMAL(18,6)), 6)::DOUBLE AS m
      FROM b GROUP BY u
    ), sc AS (
      SELECT u, r, f, m,
             ntile(5) OVER (ORDER BY r DESC, u) AS r_score,
             ntile(5) OVER (ORDER BY f ASC, u) AS f_score,
             ntile(5) OVER (ORDER BY m ASC, u) AS m_score
      FROM pu
    )
    SELECT r_score::INT AS r_score, f_score::INT AS f_score,
           m_score::INT AS m_score,
           count(*)::BIGINT AS users,
           round(avg(r), 6) AS avg_recency_days,
           round(avg(f), 6) AS avg_frequency,
           round(avg(m), 6) AS avg_monetary
    FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def x13_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — RFM lifecycle segmentation (round 8): per user, days
    since last valued event, event count, and value sum, each scored
    into quintiles over a (metric, user) total order — deterministic
    tile assignment, engine-reproducible — then rolled up per
    (r, f, m) cell with user counts and cell means: the grid that
    marketing's champions/at-risk/hibernating labels rename. Events
    fold to ONE per-user aggregate before any window; the global
    ntile runs on the user frame (swap for broadcast percentile
    boundaries past ~10^8 users — the quality_tiers_scalable
    pattern). NULL-valued events are excluded on both engines (their
    NULL-ordering conventions differ)
    (operators/relational.py:rfm_segments)."""
    from vectordb_migrator_spark.operators.relational import rfm_segments

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return rfm_segments(
        ev, user_col="user_id", ts_col="ts", value_col="value"
    )


def _compression_ladder_sql() -> str:
    """Oracle for x4_compression_ladder: one truth CTE, one approx
    ranking per storage tier (int8 / NF4 dequantized cosine, binary
    sign-Hamming), recall joined per tier — the same per-method
    expressions the standalone tier oracles use."""
    from vectordb_migrator_spark.suite.s08_relational_a import (
        _nf4_literals,
    )

    mids, levels = _nf4_literals()
    tiers = {
        "1_fp32": ("SELECT vec_id FROM truth", 256),
        "2_int8": (
            """
      SELECT vec_id FROM (
        SELECT vec_id,
               CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
                    ELSE list_transform(v, x -> round(x / scale) * scale)
               END AS dv
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v,
                     list_max(list_transform(embedding::DOUBLE[],
                                             x -> abs(x))) / 127.0
                       AS scale
              FROM embeddings)), p
      ORDER BY round(list_dot_product(dv, pv) /
                 (sqrt(list_dot_product(dv, dv)) *
                  sqrt(list_dot_product(pv, pv))), 6) DESC, vec_id
      LIMIT 10""",
            64,
        ),
        "3_nf4": (
            f"""
      SELECT vec_id FROM (
        SELECT vec_id,
               CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
                    ELSE list_transform(v, x ->
                      {levels}[len(list_filter({mids},
                          m -> x / scale > m)) + 1] * scale)
               END AS dv
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v,
                     list_max(list_transform(embedding::DOUBLE[],
                                             x -> abs(x))) AS scale
              FROM embeddings)), p
      ORDER BY round(list_dot_product(dv, pv) /
                 (sqrt(list_dot_product(dv, dv)) *
                  sqrt(list_dot_product(pv, pv))), 6) DESC, vec_id
      LIMIT 10""",
            32,
        ),
        "4_binary": (
            """
      SELECT vec_id FROM embeddings, p
      ORDER BY len(list_filter(range(1, len(embedding) + 1),
                               i -> (embedding[i] > 0) != (pv[i] > 0))),
               vec_id
      LIMIT 10""",
            8,
        ),
    }
    parts = []
    for name, (sub, nbytes) in tiers.items():
        parts.append(f"""
    SELECT '{name}' AS tier, {nbytes}::BIGINT AS bytes_per_vector,
           round(256.0 / {nbytes}, 6) AS compression_x,
           10::BIGINT AS k, count(*)::BIGINT AS n_hits,
           round(count(*) / 10.0, 6) AS recall
    FROM truth JOIN ({sub}) a USING (vec_id)""")
    return (
        """
    WITH p AS (SELECT {probe} AS pv),
    truth AS (
      SELECT vec_id FROM embeddings, p
      ORDER BY round(list_dot_product(embedding::DOUBLE[], pv) /
                 (sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) *
                  sqrt(list_dot_product(pv, pv))), 6) DESC, vec_id
      LIMIT 10)
    """
        + " UNION ALL ".join(parts)
        + " ORDER BY tier"
    )


@query("x4_compression_ladder", None)  # oracle bound below (needs probe)
def x4_compression_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — the storage/recall frontier in ONE report (round 8):
    recall@10 against float truth for each quantization tier the
    engine ships — fp32 anchor (1×), int8 scalar (4×), NF4 (8×),
    sign-binary (32×) — with bytes/vector and compression ratio in
    the row. This is the table a capacity plan actually reads: at
    100 TB of embeddings, "which tier serves and which tier reranks"
    IS this frontier. Each tier is the same narrow scan +
    TakeOrderedAndProject(k) its standalone query uses; the recall
    joins are k-row-sized; the fp32 row doubles as the self-check
    anchor (recall 1.0 by construction)
    (operators/similarity.py:sq_topk, hamming_topk;
    functions/vector.py:nf4_quantize)."""
    from vectordb_migrator_spark.functions.vector import (
        nf4_dequantize,
        nf4_quantize,
    )
    from vectordb_migrator_spark.operators.similarity import (
        cosine_topk,
        hamming_topk,
        sq_topk,
    )
    from vectordb_migrator_spark.operators.util import fan_out
    from vectordb_migrator_spark.suite._shared import _probe_vector

    probe = _probe_vector(spark, sf_dir)
    e = fan_out(_t(spark, sf_dir, "embeddings"))
    truth = cosine_topk(e, probe, k=10).select("vec_id")
    nf4 = e.select(
        "vec_id", nf4_dequantize(nf4_quantize("embedding")).alias("embedding")
    )
    tiers = [
        ("1_fp32", 256, truth),
        ("2_int8", 64, sq_topk(e, probe, k=10).select("vec_id")),
        ("3_nf4", 32, cosine_topk(nf4, probe, k=10).select("vec_id")),
        ("4_binary", 8, hamming_topk(e, probe, k=10).select("vec_id")),
    ]
    out = None
    for name, nbytes, appr in tiers:
        row = truth.join(appr, "vec_id").agg(
            F.lit(name).alias("tier"),
            F.lit(nbytes).cast("long").alias("bytes_per_vector"),
            F.round(F.lit(256.0 / nbytes), 6).alias("compression_x"),
            F.lit(10).cast("long").alias("k"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.round(F.count(F.lit(1)) / F.lit(10.0), 6).alias("recall"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("tier")


def _bind_compression_ladder_oracle() -> None:
    from vectordb_migrator_spark.suite._shared import _PROBE_SQL, ORACLES

    ORACLES["x4_compression_ladder"] = _compression_ladder_sql().format(
        probe=_PROBE_SQL
    )


_bind_compression_ladder_oracle()


def _multi_signal_sql() -> str:
    """Oracle for x2_multi_signal_clusters: the ngram-pair CTE and
    the CDC-pair CTE (disjoint names), a tagged edge union, the
    recursive-CTE transitive closure (the x2_dedup_clusters pattern),
    and per-family detector provenance counts."""
    cdc_body = _CDC_CHUNKS_CTE.split("WITH", 1)[1]
    return (
        _NGRAM_PAIRS_CTE.replace("WITH sh AS", "WITH RECURSIVE sh AS")
        + ","
        + cdc_body
        + """
    , cdcp AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM (SELECT DISTINCT id, chunk_md5 FROM chunks) a
      JOIN (SELECT DISTINCT id, chunk_md5 FROM chunks) b
        ON a.chunk_md5 = b.chunk_md5 AND a.id < b.id
      JOIN (SELECT chunk_md5, count(DISTINCT id) AS n,
                   min(id) AS anchor
            FROM chunks GROUP BY 1) f
        ON f.chunk_md5 = a.chunk_md5
      WHERE f.n <= 50 OR a.id = f.anchor
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), tagged AS (
      SELECT id_a, id_b, 'jaccard' AS det FROM pairs
      UNION ALL SELECT id_a, id_b, 'cdc' FROM cdcp
    ), edges AS (
      SELECT DISTINCT id_a AS a, id_b AS b FROM tagged
      UNION SELECT id_b, id_a FROM tagged
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), comp AS (
      SELECT a AS id, least(a, min(b))::BIGINT AS comp
      FROM reach GROUP BY a
    ), fam AS (
      SELECT t.id_a, t.id_b, t.det, c.comp
      FROM tagged t JOIN comp c ON c.id = t.id_a
    )
    , sizes AS (
      SELECT comp, count(*)::BIGINT AS size FROM comp GROUP BY comp
    ), prov AS (
      SELECT comp,
             sum(CASE WHEN det = 'jaccard' THEN 1 ELSE 0 END)::BIGINT
               AS jaccard_edges,
             sum(CASE WHEN det = 'cdc' THEN 1 ELSE 0 END)::BIGINT
               AS cdc_edges
      FROM fam GROUP BY comp
    )
    SELECT s.comp, s.size,
           coalesce(p.jaccard_edges, 0)::BIGINT AS jaccard_edges,
           coalesce(p.cdc_edges, 0)::BIGINT AS cdc_edges
    FROM sizes s LEFT JOIN prov p USING (comp)
    ORDER BY s.comp"""
    )


@query("x2_multi_signal_clusters", _multi_signal_sql())
def x2_multi_signal_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — multi-signal dedup closure (round 8): production dedup
    never trusts one detector, so this unions the n-gram Jaccard
    pairs with the shift-robust CDC chunk-share pairs into ONE edge
    set, closes components over the union, and reports per family
    how many edges each detector contributed — the provenance a
    curation owner reads to see which families exist ONLY because of
    the shift-robust signal (fixed shingling alone would have split
    them). Both pair kernels are the star-capped blocked joins their
    standalone queries use; the closure shuffles (long, long) ids;
    the provenance rollup is one duplicate-sized join. Full oracle
    via the recursive-CTE closure over the same tagged union
    (operators/dedup.py:cdc_pair_candidates,
    operators/graph.py:connected_components)."""
    from vectordb_migrator_spark.operators.dedup import (
        cdc_chunks,
        cdc_pair_candidates,
    )
    from vectordb_migrator_spark.operators.graph import (
        connected_components,
    )

    docs = _t(spark, sf_dir, "documents")
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.2)
    cdc = cdc_pair_candidates(
        cdc_chunks(docs, avg_tokens=8), min_shared=2, max_bucket=50
    ).select("id_a", "id_b")
    tagged = (
        jac.select("id_a", "id_b").withColumn("det", F.lit("jaccard"))
        .unionAll(cdc.withColumn("det", F.lit("cdc")))
        .localCheckpoint(eager=True)
    )
    comp = connected_components(
        tagged.select("id_a", "id_b").distinct()
    ).localCheckpoint(eager=True)
    fam = tagged.join(
        comp.withColumnRenamed("id", "id_a"), "id_a"
    ).select("comp", "det")
    sizes = comp.groupBy("comp").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    provenance = fam.groupBy("comp").agg(
        F.coalesce(
            F.sum((F.col("det") == "jaccard").cast("long")), F.lit(0)
        ).cast("long").alias("jaccard_edges"),
        F.coalesce(
            F.sum((F.col("det") == "cdc").cast("long")), F.lit(0)
        ).cast("long").alias("cdc_edges"),
    )
    return (
        sizes.join(provenance, "comp", "left")
        .select(
            "comp",
            "size",
            F.coalesce("jaccard_edges", F.lit(0)).cast("long").alias(
                "jaccard_edges"
            ),
            F.coalesce("cdc_edges", F.lit(0)).cast("long").alias(
                "cdc_edges"
            ),
        )
        .orderBy("comp")
    )


@query(
    "x11_sql_near_dup",
    _NGRAM_PAIRS_CTE
    + """
    SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b""",
)
def x11_sql_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11 — the near-dup pair kernel written ENTIRELY as SQL text
    (round 8): 3-gram shingling via higher-order functions
    (transform over a sequence + array_distinct), explode, the
    gram-keyed self-join with the Jaccard HAVING gate — submitted
    through ``spark.sql`` over a registered view, proving a SQL-only
    user can run the repo's single most-composed kernel (everything
    from the cluster closures to the graph family builds on these
    pairs) without touching the Column API. Catalyst compiles the
    HOF shingling into the same codegen the operator gets; the join
    and aggregate shapes are identical. Full oracle: the same CTE
    text every graph-family oracle inlines, dialect aside."""
    _t(spark, sf_dir, "documents").createOrReplaceTempView(
        "vm_documents"
    )
    return spark.sql(
        r"""
        WITH t AS (
          -- REPARTITION hint = the SQL-text spelling of fan_out():
          -- a one-file toy scan would otherwise shingle+join on a
          -- single partition (no-op on real multi-file corpora)
          SELECT /*+ REPARTITION(32) */ doc_id AS id,
                 split(lower(regexp_replace(text, '^\\s+|\\s+$', '')),
                       '\\s+') AS toks
          FROM vm_documents
        ), sh AS (
          -- the operator's zip_with chain, verbatim in SQL: gram i =
          -- tok[i] ++ tok[i+1] ++ tok[i+2], no per-gram sub-arrays
          SELECT id,
                 array_distinct(
                   zip_with(
                     zip_with(slice(toks, 1, size(toks) - 2),
                              slice(toks, 2, size(toks) - 2),
                              (a, b) -> concat(a, ' ', b)),
                     slice(toks, 3, size(toks) - 2),
                     (a, b) -> concat(a, ' ', b))) AS g
          FROM t WHERE size(toks) >= 3
        ), ex AS (
          SELECT id, size(g) AS n, explode(g) AS gram FROM sh
        )
        SELECT a.id AS id_a, b.id AS id_b
        FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
        GROUP BY a.id, b.id
        HAVING count(*) / CAST(min(a.n) + min(b.n) - count(*) AS DOUBLE)
               >= 0.2
        ORDER BY id_a, id_b
        """
    )


_FD_DEPS = [
    ("nation", "n_nationkey", "n_regionkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("events", "user_id", "event_type"),
    ("lineitem", "l_orderkey", "l_returnflag"),
]


def _fd_audit_sql() -> str:
    parts = []
    for tbl, lhs, rhs in _FD_DEPS:
        parts.append(f"""
    SELECT '{lhs}->{rhs}' AS dependency,
           (SELECT count(*) FROM per_{tbl})::BIGINT AS n_keys,
           (SELECT count(*) FROM per_{tbl} WHERE ny > 1)::BIGINT
             AS violations,
           round((SELECT count(*) FROM per_{tbl} WHERE ny > 1)::DOUBLE
                 / (SELECT count(*) FROM per_{tbl}), 6)
             AS violation_rate,
           (SELECT coalesce(string_agg(x, ',' ORDER BY x), '') FROM
              (SELECT x FROM per_{tbl} WHERE ny > 1
               ORDER BY x LIMIT 3)) AS example_keys""")
    ctes = ", ".join(
        f"""per_{tbl} AS (
      SELECT x, count(*)::BIGINT AS ny FROM (
        SELECT DISTINCT {lhs}::VARCHAR AS x, {rhs}::VARCHAR AS y
        FROM {tbl} WHERE {lhs} IS NOT NULL)
      GROUP BY x
    )"""
        for tbl, lhs, rhs in _FD_DEPS
    )
    return (
        "WITH " + ctes + "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY dependency"
    )


@query("x12_fd_violations", _fd_audit_sql())
def x12_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — functional-dependency audit across the warehouse
    (round 8): for each claimed "X determines Y", the X values that
    map to more than one distinct Y — how bad dimensional models and
    silent join fan-out get caught before they corrupt a report. The
    battery mixes a dependency that must HOLD (nation key → region,
    a real FK-backed FD — a nonzero row here is a data bug) with
    behavioral non-FDs (customer-nation → market segment, user →
    event type, order → return flag) whose violation RATES are the
    profile. Per dependency: one (X, Y)-distinct aggregate folded to
    per-X Y-counts, bounded deterministic example keys
    (lexicographic, hash-stable)
    (operators/validation.py:fd_audit)."""
    from vectordb_migrator_spark.operators.validation import fd_audit

    out = None
    for tbl, lhs, rhs in _FD_DEPS:
        row = fd_audit(_t(spark, sf_dir, tbl), [(lhs, rhs)])
        out = row if out is None else out.unionByName(row)
    return out.orderBy("dependency")


@query(
    "x13_anomaly_ensemble",
    """
    WITH d AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             round(sum(round(value, 6)::DECIMAL(18,6)) / count(*), 6)
               ::DOUBLE AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), s AS (
      SELECT avg(v) AS mu, stddev_pop(v) AS sd,
             quantile_cont(v, 0.5) AS med
      FROM d
    ), m AS (
      SELECT quantile_cont(abs(v - (SELECT med FROM s)), 0.5) AS mad
      FROM d
    ), sc AS (
      SELECT day, v,
             CASE WHEN sd = 0 THEN NULL
                  ELSE round((v - mu) / sd, 6) END AS z,
             CASE WHEN (SELECT mad FROM m) = 0 THEN NULL
                  ELSE round(0.6745 * (v - med)
                             / (SELECT mad FROM m), 6) END AS rz,
             round(sum(CASE WHEN sd = 0 THEN NULL
                            ELSE (v - mu) / sd END)
                   OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW), 6) AS cusum
      FROM d, s
    ), fl AS (
      SELECT day, v,
             coalesce((abs(z) > 2.0)::INT, 0)::BIGINT AS z_flag,
             coalesce((abs(rz) >= 3.5)::INT, 0)::BIGINT AS mad_flag,
             coalesce((abs(cusum) > 3.0)::INT, 0)::BIGINT AS cusum_flag
      FROM sc
    )
    SELECT day, v, z_flag, mad_flag, cusum_flag,
           (z_flag + mad_flag + cusum_flag)::BIGINT AS votes,
           z_flag + mad_flag + cusum_flag >= 2 AS flagged
    FROM fl ORDER BY day
    """,
)
def x13_anomaly_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — ensemble anomaly vote over the daily value series
    (round 8): z-score (sharp spikes, maskable), MAD modified-z
    (robust to exactly that masking), and CUSUM (sustained small
    shifts the point detectors miss) each vote per day; ``flagged``
    requires two independent mechanisms to agree — the composition
    rule that keeps single-detector noise off the pager. The corpus
    folds to daily means first (the shared X13 pre-aggregation);
    every score rounds to 6 before thresholding so the vote set is
    engine-stable; degenerate stats (sd = 0, MAD = 0) vote nothing
    instead of aborting (operators/timeseries.py:anomaly_ensemble)."""
    from vectordb_migrator_spark.operators.timeseries import (
        anomaly_ensemble,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(
        F.round(
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)"))
            / F.count(F.lit(1)),
            6,
        )
        .cast("double")
        .alias("v")
    )
    return anomaly_ensemble(daily)


@query(
    "x7_cmh_test",
    """
    WITH t AS (
      SELECT event_type AS s,
             (user_id % 2 = 0) AS exp,
             (value > 50.0) AS outc
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
    ), cells AS (
      SELECT s,
             sum(CASE WHEN exp AND outc THEN 1 ELSE 0 END)::BIGINT AS a,
             sum(CASE WHEN exp AND NOT outc THEN 1 ELSE 0 END)::BIGINT
               AS b,
             sum(CASE WHEN NOT exp AND outc THEN 1 ELSE 0 END)::BIGINT
               AS c,
             sum(CASE WHEN NOT exp AND NOT outc THEN 1 ELSE 0 END)
               ::BIGINT AS d
      FROM t GROUP BY s
    ), terms AS (
      SELECT a, b, c, d,
             (a + b + c + d)::DOUBLE AS n,
             round((a + b)::DOUBLE * (a + c)
                   / (a + b + c + d), 9) AS e,
             CASE WHEN a + b + c + d > 1 THEN
               round((a + b)::DOUBLE * (c + d) * (a + c) * (b + d)
                     / ((a + b + c + d)::DOUBLE * (a + b + c + d)
                        * (a + b + c + d - 1)), 9) END AS var,
             round(a::DOUBLE * d / (a + b + c + d), 9) AS ad,
             round(b::DOUBLE * c / (a + b + c + d), 9) AS bc
      FROM cells
    ), agg AS (
      SELECT count(*)::BIGINT AS n_strata,
             sum(a)::BIGINT AS sum_a,
             sum(e::DECIMAL(28,9))::DOUBLE AS se,
             sum(var::DECIMAL(28,9))::DOUBLE AS sv,
             sum(ad::DECIMAL(28,9))::DOUBLE AS sad,
             sum(bc::DECIMAL(28,9))::DOUBLE AS sbc,
             sum(a)::DOUBLE AS ta, sum(b)::DOUBLE AS tb,
             sum(c)::DOUBLE AS tc, sum(d)::DOUBLE AS td
      FROM terms
    )
    SELECT n_strata, sum_a,
           round(se, 6) AS expected_a,
           round(sv, 6) AS variance,
           round((abs(sum_a - se) - 0.5) * (abs(sum_a - se) - 0.5)
                 / sv, 6) AS cmh_chi2,
           round(sad / sbc, 6) AS or_mh,
           round(ta * td / (tb * tc), 6) AS or_pooled,
           round((abs(sum_a - se) - 0.5) * (abs(sum_a - se) - 0.5)
                 / sv, 6) > 3.841459 AS significant
    FROM agg
    """,
)
def x7_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — Cochran–Mantel–Haenszel stratified test (round 8), the
    Simpson's-paradox guard completing the experiment battery: the
    variant's effect on high-value conversion tested ACROSS
    per-event-type 2×2 tables (a pooled comparison can reverse sign
    when exposure is uneven across strata), with the Mantel–Haenszel
    common odds ratio reported NEXT TO the naive pooled one so the
    paradox is visible in a single row. One (stratum, exposure,
    outcome) count aggregate collapses the corpus; per-stratum terms
    round to 9 and sum as DECIMAL, so the report hash-matches
    (operators/scale.py:cmh_test)."""
    from vectordb_migrator_spark.operators.scale import cmh_test

    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    t = ev.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("v"),
        (F.col("value") > 50.0).alias("outc"),
    )
    return cmh_test(
        t,
        strata_col="event_type",
        exposure_col="v",
        exposed="a",
        outcome_col="outc",
    )


def _matryoshka_rerank_sql() -> str:
    """Oracle for x4_matryoshka_rerank: 16-dim prefix shortlist of 50,
    full-width cosine rerank to 10, hit flags vs the full-scan truth."""
    return """
    WITH p AS (SELECT {probe} AS pv),
    q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    short AS (
      SELECT vec_id, v FROM q, p
      ORDER BY round(list_dot_product(v[1:16], pv[1:16]) /
                 (sqrt(list_dot_product(v[1:16], v[1:16])) *
                  sqrt(list_dot_product(pv[1:16], pv[1:16]))), 6)
               DESC, vec_id
      LIMIT 50
    ),
    rer AS (
      SELECT vec_id,
             round(list_dot_product(v, pv) /
                   (sqrt(list_dot_product(v, v)) *
                    sqrt(list_dot_product(pv, pv))), 6) AS score
      FROM short, p
      ORDER BY score DESC, vec_id LIMIT 10
    ),
    truth AS (
      SELECT vec_id, row_number() OVER (ORDER BY sc DESC, vec_id)
               AS trank
      FROM (SELECT vec_id,
                   round(list_dot_product(v, pv) /
                         (sqrt(list_dot_product(v, v)) *
                          sqrt(list_dot_product(pv, pv))), 6) AS sc
            FROM q, p)
      ORDER BY sc DESC, vec_id LIMIT 10
    )
    SELECT r.vec_id,
           row_number() OVER (ORDER BY r.score DESC, r.vec_id)::BIGINT
             AS rank,
           r.score,
           (t.vec_id IS NOT NULL) AS in_truth
    FROM rer r LEFT JOIN truth t USING (vec_id)
    ORDER BY rank"""


@query("x4_matryoshka_rerank", None)  # oracle bound below (needs probe)
def x4_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — the MRL TWO-STAGE serving pattern (round 8), the query
    ``x4_matryoshka_recall`` motivates: shortlist 50 candidates by
    cosine over the FIRST 16 dims (4× less scan bandwidth — at 100 TB
    the prefix is the hot tier), then rerank the 50-row shortlist at
    full width and keep 10, each row flagged against the full-scan
    truth. Stage 1 is a narrow prefix scan + TakeOrdered(50); stage 2
    touches full vectors for 50 rows only — the full-precision read
    amplification IS the shortlist size, never the corpus. Full
    oracle replays both stages
    (operators/similarity.py:cosine_topk)."""
    from vectordb_migrator_spark.operators.similarity import cosine_topk
    from vectordb_migrator_spark.operators.util import fan_out
    from vectordb_migrator_spark.suite._shared import _probe_vector
    from pyspark.sql import Window as W

    probe = _probe_vector(spark, sf_dir)
    e = fan_out(_t(spark, sf_dir, "embeddings"))
    sliced = e.select(
        "vec_id",
        "embedding",
        F.slice(F.col("embedding"), 1, 16).alias("__pfx"),
    )
    short = cosine_topk(
        sliced,
        probe[:16],
        k=50,
        vec_col="__pfx",
        payload_cols=["embedding"],
    ).select("vec_id", "embedding")
    rer = cosine_topk(short, probe, k=10)
    truth = cosine_topk(e, probe, k=10).select("vec_id")
    return (
        rer.withColumn(
            "rank",
            F.row_number()
            .over(W.orderBy(F.desc("score"), "vec_id"))
            .cast("long"),
        )
        .join(truth.withColumn("__t", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            "rank",
            "score",
            F.col("__t").isNotNull().alias("in_truth"),
        )
        .orderBy("rank")
    )


def _bind_matryoshka_rerank_oracle() -> None:
    from vectordb_migrator_spark.suite._shared import _PROBE_SQL, ORACLES

    ORACLES["x4_matryoshka_rerank"] = _matryoshka_rerank_sql().format(
        probe=_PROBE_SQL
    )


_bind_matryoshka_rerank_oracle()


@query(
    "x13_mix_decomposition",
    """
    WITH m AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid
               FROM events),
    t AS (SELECT event_type AS segment,
                 CASE WHEN epoch(ts) <= m.mid THEN 'a' ELSE 'b' END
                   AS p,
                 value
          FROM events, m WHERE value IS NOT NULL),
    per AS (
      SELECT segment, p, count(*)::BIGINT AS n,
             sum(round(value, 6)::DECIMAL(18,6)) AS s
      FROM t GROUP BY 1, 2
    ), wide AS (
      SELECT segment,
             coalesce(max(CASE WHEN p = 'a' THEN n END), 0)::DOUBLE
               AS n_a,
             coalesce(max(CASE WHEN p = 'a' THEN s END),
                      0::DECIMAL(18,6))::DOUBLE AS s_a,
             coalesce(max(CASE WHEN p = 'b' THEN n END), 0)::DOUBLE
               AS n_b,
             coalesce(max(CASE WHEN p = 'b' THEN s END),
                      0::DECIMAL(18,6))::DOUBLE AS s_b
      FROM per GROUP BY segment
    ), sc AS (
      SELECT segment, n_a, n_b,
             round(CASE WHEN n_a = 0 THEN 0.0 ELSE s_a / n_a END, 6)
               AS rate_a,
             round(CASE WHEN n_b = 0 THEN 0.0 ELSE s_b / n_b END, 6)
               AS rate_b
      FROM wide
    )
    SELECT segment, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           rate_a, rate_b,
           round((n_b - n_a) * rate_a, 6) AS volume_effect,
           round(n_a * (rate_b - rate_a), 6) AS rate_effect,
           round((n_b - n_a) * (rate_b - rate_a), 6) AS interaction,
           round(n_b * rate_b - n_a * rate_a, 6) AS total_change
    FROM sc ORDER BY segment
    """,
)
def x13_mix_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — period-over-period volume/rate decomposition (round 8):
    per event type, the first-half → second-half change in total
    value splits EXACTLY into volume effect (count moved), rate
    effect (per-event value moved), and interaction — the canonical
    "did the metric move because the segment grew or because its
    rate shifted" answer that completes the attribution family
    (``x13_attribution`` = which touchpoint, ``x12_root_cause`` =
    which dimension, this = volume or rate). One (segment, period)
    aggregate collapses the corpus; effects sum to the total change
    by construction, so nothing is unattributed
    (operators/timeseries.py:mix_decomposition)."""
    from vectordb_migrator_spark.operators.timeseries import (
        mix_decomposition,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    mid = ev.agg(
        (
            (
                F.min(F.col("ts").cast("double"))
                + F.max(F.col("ts").cast("double"))
            )
            / 2
        ).alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.when(F.col("ts").cast("double") <= F.col("mid"), "a")
        .otherwise("b")
        .alias("p"),
        "value",
    )
    return mix_decomposition(
        tagged,
        segment_col="event_type",
        period_col="p",
        value_col="value",
        period_a="a",
        period_b="b",
    )


@query(
    "x13_interarrival_profile",
    """
    WITH g0 AS (
      SELECT event_type AS key,
             epoch(ts) - lag(epoch(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS g
      FROM events
    ), gg AS (SELECT key, g FROM g0 WHERE g IS NOT NULL),
    m AS (
      SELECT key, count(*)::BIGINT AS n_gaps,
             sum(round(g, 6)::DECIMAL(18,6))::DECIMAL(38,6) AS s,
             sum(round(g, 6)::DECIMAL(19,6)
                 * round(g, 6)::DECIMAL(19,6))::DECIMAL(38,12) AS ss
      FROM gg GROUP BY key
    ), st AS (
      SELECT key, n_gaps,
             s::DOUBLE / n_gaps AS mu,
             sqrt(greatest(ss::DOUBLE / n_gaps
                           - (s::DOUBLE / n_gaps)
                             * (s::DOUBLE / n_gaps), 0.0)) AS sd
      FROM m
    ), rk AS (
      SELECT gg.key, gg.g,
             row_number() OVER (PARTITION BY gg.key ORDER BY gg.g)
               AS i,
             count(*) OVER (PARTITION BY gg.key) AS n,
             round(1.0 - exp(-(gg.g / st.mu)), 9) AS f
      FROM gg JOIN st ON st.key = gg.key WHERE st.n_gaps >= 2
    ), ks AS (
      SELECT key,
             round(max(greatest(abs(i::DOUBLE / n - f),
                                abs((i - 1)::DOUBLE / n - f))), 6)
               AS ks_d
      FROM rk GROUP BY key
    )
    SELECT st.key, st.n_gaps,
           round(mu, 6) AS mean_gap_s,
           round(CASE WHEN mu = 0 THEN NULL ELSE sd / mu END, 6) AS cv,
           round(CASE WHEN sd + mu = 0 THEN NULL
                 ELSE (sd - mu) / (sd + mu) END, 6) AS burstiness,
           ks.ks_d,
           ks.ks_d <= round(1.358 / sqrt(st.n_gaps), 6)
             AS exponential_fit_ok
    FROM st LEFT JOIN ks USING (key) ORDER BY st.key
    """,
)
def x13_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — inter-arrival process profile (round 8): per event type,
    mean gap, CV, Goh–Barabási burstiness (−1 metronome, 0 Poisson,
    →1 bursty), and a KS goodness-of-fit D against the fitted
    exponential — the diagnostic that says whether the gap-based SLA
    math ``x13_event_gaps`` feeds (p99 gap ≈ −ln(.01)/λ) is licensed
    at all: memorylessness holds only if the exponential fits. Gaps
    come from the same tie-broken lag window as event_gaps; moments
    sum as decimals; F(t) rounds to 9 before the ECDF diffs so the
    engines' exp ulps vanish
    (operators/timeseries.py:interarrival_profile)."""
    from vectordb_migrator_spark.operators.timeseries import (
        interarrival_profile,
    )

    return interarrival_profile(_t(spark, sf_dir, "events"))


_KEY_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _key_discovery_sql() -> str:
    parts = [
        f"""
    SELECT '{c}' AS candidate,
           count(*)::BIGINT AS n_rows,
           sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_null,
           count(DISTINCT {c})::BIGINT AS ndv,
           round(count(DISTINCT {c})::DOUBLE / count(*), 6)
             AS uniqueness,
           count(DISTINCT {c}) = count(*)
             AND sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) = 0
             AS is_key
    FROM orders"""
        for c in _KEY_COLS
    ]
    comp = """
    SELECT 'o_custkey+o_orderdate' AS candidate,
           count(*)::BIGINT AS n_rows,
           0::BIGINT AS n_null,
           count(DISTINCT concat_ws(chr(31), o_custkey::VARCHAR,
                                    o_orderdate::VARCHAR))::BIGINT
             AS ndv,
           round(count(DISTINCT concat_ws(chr(31), o_custkey::VARCHAR,
                                          o_orderdate::VARCHAR))::DOUBLE
                 / count(*), 6) AS uniqueness,
           count(DISTINCT concat_ws(chr(31), o_custkey::VARCHAR,
                                    o_orderdate::VARCHAR)) = count(*)
             AS is_key
    FROM orders"""
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts + [comp])
        + ") ORDER BY candidate"
    )


@query("x12_key_discovery", _key_discovery_sql())
def x12_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — candidate-key discovery over the orders table (round 8):
    the inverse of ``x12_pk_uniqueness`` (that audits DECLARED keys;
    this finds them): per column and one opted-in composite, exact
    ndv, NULL count, uniqueness ratio, and the is_key verdict — the
    schema-inference row behind "what can this table join on" and
    dedup-key selection. Composites are opt-in named pairs, never the
    combinatorial lattice; each candidate is one map-side-combinable
    distinct aggregate, with the documented approx_count_distinct
    screen-then-verify swap at warehouse scale
    (operators/validation.py:key_discovery)."""
    from vectordb_migrator_spark.operators.validation import key_discovery

    return key_discovery(
        _t(spark, sf_dir, "orders"),
        _KEY_COLS,
        composites=[("o_custkey", "o_orderdate")],
    )


@query(
    "x7_ratio_ci",
    """
    WITH t AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS variant,
             user_id AS u,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
             1 AS y
      FROM events WHERE user_id IS NOT NULL
    ), pu AS (
      SELECT variant, u, sum(x)::BIGINT AS x, sum(y)::BIGINT AS y
      FROM t GROUP BY 1, 2
    ), m AS (
      SELECT variant, count(*)::BIGINT AS n_units,
             sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
             sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
             sum(x * y)::BIGINT AS sxy
      FROM pu GROUP BY 1
    ), c AS (
      SELECT variant, n_units, sum_x, sum_y,
             n_units::DOUBLE AS n,
             sum_x::DOUBLE / sum_y AS r,
             (sxx - n_units * (sum_x::DOUBLE / n_units)
                            * (sum_x::DOUBLE / n_units))
               / (n_units - 1) AS cxx,
             (syy - n_units * (sum_y::DOUBLE / n_units)
                            * (sum_y::DOUBLE / n_units))
               / (n_units - 1) AS cyy,
             (sxy - n_units * (sum_x::DOUBLE / n_units)
                            * (sum_y::DOUBLE / n_units))
               / (n_units - 1) AS cxy
      FROM m
    ), s AS (
      SELECT variant, n_units, sum_x, sum_y, r,
             CASE WHEN n_units >= 2 AND sum_y > 0 THEN
               sqrt(greatest((cxx - 2 * r * cxy + r * r * cyy)
                             / (n * (sum_y::DOUBLE / n)
                                  * (sum_y::DOUBLE / n)), 0.0))
             END AS se
      FROM c
    )
    SELECT variant, n_units, sum_x, sum_y,
           round(r, 6) AS ratio, round(se, 6) AS se,
           round(r - 1.959964 * se, 6) AS ci_lo,
           round(r + 1.959964 * se, 6) AS ci_hi
    FROM s ORDER BY variant
    """,
)
def x7_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — delta-method CI for the per-user purchase RATE (round 8):
    the metric is Σ purchases / Σ events per variant with USERS as
    the randomization unit, so the variance must carry the within-
    user numerator–denominator covariance — the correction a naive
    per-row proportion CI omits (and understates). Counts make every
    moment sum exact integer arithmetic: the report is bit-identical
    across engines before the final round-6. One (variant, user)
    fold, then variants-sized algebra
    (operators/scale.py:ratio_metric_ci)."""
    from vectordb_migrator_spark.operators.scale import ratio_metric_ci

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    t = ev.select(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("v"),
        F.col("user_id").alias("u"),
        (F.col("event_type") == "purchase").cast("int").alias("x"),
        F.lit(1).alias("y"),
    )
    return ratio_metric_ci(
        t,
        unit_col="u",
        variant_col="v",
        numerator_col="x",
        denominator_col="y",
    )


@query(
    "x9_affine_quantization",
    """
    WITH q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_min(embedding::DOUBLE[]) AS mn,
             (list_max(embedding::DOUBLE[])
              - list_min(embedding::DOUBLE[])) / 255.0 AS scale
      FROM embeddings
    ), z AS (
      SELECT vec_id, v, mn, scale,
             CASE WHEN scale = 0 THEN 0
                  ELSE least(255, greatest(0,
                         round(-mn / scale)::INT)) END AS zp
      FROM q
    ), c AS (
      SELECT vec_id, scale, zp,
             CASE WHEN scale = 0
                  THEN list_transform(v, x -> 0)
                  ELSE list_transform(v, x ->
                         least(255, greatest(0,
                           round(x / scale)::INT + zp))) END AS codes,
             v, mn
      FROM z
    )
    SELECT vec_id, round(scale, 6) AS scale, zp AS zero_point,
           array_to_string(codes, ',') AS q,
           round(CASE WHEN scale = 0 THEN 0.0 ELSE
             list_max([abs(v[i] - (codes[i] - zp) * scale)
                       for i in range(1, len(v) + 1)]) END, 6)
             AS max_err
    FROM c ORDER BY vec_id
    """,
)
def x9_affine_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — asymmetric uint8 (affine) quantization of the embedding
    column + max reconstruction error (round 8): the zero-point
    scheme that spends all 256 codes on the occupied [min, max]
    interval — on one-sided data (ReLU features) the symmetric int8
    grid wastes half its range and doubles the error; reading this
    row next to ``x9_int8_quantization`` quantifies that choice on
    THIS corpus. Pure codegen transforms, shuffle-free
    (functions/vector.py:affine_quantize)."""
    from vectordb_migrator_spark.functions.vector import affine_quantize
    from vectordb_migrator_spark.operators.util import fan_out

    e = fan_out(_t(spark, sf_dir, "embeddings"))
    qs = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        affine_quantize("embedding").alias("qs"),
    )
    err = F.aggregate(
        F.zip_with(
            "v",
            F.transform(
                F.col("qs.q"),
                lambda x: (
                    x.cast("double") - F.col("qs.zero_point").cast("double")
                )
                * F.col("qs.scale"),
            ),
            lambda a, b: F.abs(a - b),
        ),
        F.lit(0.0),
        lambda s, x: F.greatest(s, x),
    )
    return qs.select(
        "vec_id",
        F.round(F.col("qs.scale"), 6).alias("scale"),
        F.col("qs.zero_point").alias("zero_point"),
        F.array_join(
            F.transform(F.col("qs.q"), lambda x: x.cast("string")), ","
        ).alias("q"),
        F.round(
            F.when(F.col("qs.scale") == 0.0, F.lit(0.0)).otherwise(err), 6
        ).alias("max_err"),
    ).orderBy("vec_id")


@query(
    "x13_seasonal_strength",
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
    ),
    comps AS (
      SELECT d.day, d.trend, s.seasonal,
             round(d.v - d.trend - s.seasonal, 6) AS resid
      FROM det d JOIN seas s USING (dow)
    )
    SELECT count(*)::BIGINT AS n_days,
           round(var_pop(resid), 6) AS var_resid,
           round(var_pop(seasonal + resid), 6) AS var_deseasonal_base,
           round(var_pop(trend + resid), 6) AS var_detrend_base,
           round(greatest(0.0, 1 - var_pop(resid)
                                 / var_pop(seasonal + resid)), 6)
             AS seasonal_strength,
           round(greatest(0.0, 1 - var_pop(resid)
                                 / var_pop(trend + resid)), 6)
             AS trend_strength
    FROM comps
    """,
)
def x13_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — Hyndman seasonal/trend strength off the STL-lite
    decomposition (round 8): F_s = max(0, 1 − Var(R)/Var(S+R)) and
    F_t likewise with the trend — the two scalars that turn
    ``x13_stl_decompose``'s component table into a decision ("is the
    weekly cycle strong enough that seasonal adjustment is mandatory
    before alerting?"). Same day-sized frame, one variance fold
    (Hyndman & Athanasopoulos, FPP3 §13.3)."""
    from pyspark.sql import Window as W

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    w = W.orderBy("day").rowsBetween(-3, 3)
    det = (
        daily.select(
            "day", "v", F.round(F.avg("v").over(w), 6).alias("trend")
        )
        .withColumn("detr", F.col("v") - F.col("trend"))
        .withColumn(
            "dow",
            (F.datediff("day", F.lit("1970-01-01")) % 7).cast("int"),
        )
    )
    seas = det.groupBy("dow").agg(
        F.round(F.avg("detr"), 6).alias("seasonal")
    )
    full = det.join(seas, "dow").select(
        "trend",
        "seasonal",
        F.round(F.col("v") - F.col("trend") - F.col("seasonal"), 6).alias(
            "resid"
        ),
    )
    vr = F.var_pop("resid")
    vs = F.var_pop(F.col("seasonal") + F.col("resid"))
    vt = F.var_pop(F.col("trend") + F.col("resid"))
    return full.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(vr, 6).alias("var_resid"),
        F.round(vs, 6).alias("var_deseasonal_base"),
        F.round(vt, 6).alias("var_detrend_base"),
        F.round(
            F.greatest(F.lit(0.0), F.lit(1.0) - F.try_divide(vr, vs)), 6
        ).alias("seasonal_strength"),
        F.round(
            F.greatest(F.lit(0.0), F.lit(1.0) - F.try_divide(vr, vt)), 6
        ).alias("trend_strength"),
    )


@query(
    "x7_eb_shrinkage",
    """
    WITH pu AS (
      SELECT user_id AS unit,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               ::BIGINT AS x,
             count(*)::BIGINT AS n
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ), rated AS (
      SELECT unit, x, n, x::DOUBLE / n AS raw_rate FROM pu WHERE n > 0
    ), mom AS (
      SELECT round(avg(raw_rate), 9) AS m,
             round(var_pop(raw_rate), 9) AS v
      FROM rated
    ), prior AS (
      SELECT CASE WHEN v > 0 AND m * (1 - m) / v - 1 > 0
                  THEN round(m * (m * (1 - m) / v - 1), 9)
                  ELSE 0.0 END AS alpha,
             CASE WHEN v > 0 AND m * (1 - m) / v - 1 > 0
                  THEN round((1 - m) * (m * (1 - m) / v - 1), 9)
                  ELSE 0.0 END AS beta
      FROM mom
    )
    SELECT unit, x, n, round(raw_rate, 6) AS raw_rate,
           p.alpha, p.beta,
           round((x + p.alpha) / (n + p.alpha + p.beta), 6)
             AS shrunk_rate
    FROM rated, prior p
    ORDER BY shrunk_rate DESC, unit LIMIT 20
    """,
)
def x7_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — empirical-Bayes rate leaderboard (round 8): per-user
    purchase rates shrunk toward the beta-binomial prior fitted by
    moment matching, so a 2/2 user cannot outrank a 95/100 one — the
    fair small-sample leaderboard (the classic batting-average
    construction), and the missing piece between the raw per-group
    rates the rollups report and the decisions people make on them.
    One user fold + a 1-row broadcast prior; moments round to 9 so
    both engines shrink with identical doubles; top-20 ranks on
    (round-6 shrunk, unit) (operators/scale.py:eb_shrink_rates)."""
    from vectordb_migrator_spark.operators.scale import eb_shrink_rates

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    t = ev.select(
        "user_id",
        (F.col("event_type") == "purchase").cast("int").alias("s"),
        F.lit(1).alias("one"),
    )
    return eb_shrink_rates(
        t, unit_col="user_id", success_col="s", trial_col="one"
    )


@query(
    "x10_post_stratification",
    """
    WITH base AS (
      SELECT event_type AS s, value,
             CAST(CONCAT('0x', substr(md5('ps:' || event_id), 1, 8))
                  AS BIGINT) % 10 AS coin
      FROM events WHERE value IS NOT NULL
    ), smp AS (
      SELECT s, value FROM base
      WHERE coin < CASE WHEN s = 'purchase' THEN 6 ELSE 2 END
    ), pop_c AS (SELECT s, count(*)::BIGINT AS np FROM base GROUP BY s),
    smp_c AS (SELECT s, count(*)::BIGINT AS ns FROM smp GROUP BY s),
    tot AS (SELECT (SELECT sum(np) FROM pop_c)::DOUBLE AS tp,
                   (SELECT sum(ns) FROM smp_c)::DOUBLE AS ts),
    wts AS (
      SELECT c.s,
             round(coalesce((p.np / tot.tp) / (c.ns / tot.ts), 0.0), 9)
               AS w
      FROM smp_c c LEFT JOIN pop_c p USING (s), tot
    ), rows_w AS (
      SELECT smp.value AS v, wts.w FROM smp JOIN wts USING (s)
    ), agg AS (
      SELECT (SELECT ts FROM tot)::BIGINT AS n_sample,
             round(avg(v), 6) AS naive_mean,
             sum(round(w * v, 9)::DECIMAL(28,9))::DOUBLE AS swv,
             sum(round(w, 9)::DECIMAL(28,9))::DOUBLE AS sw,
             sum(round(w * w, 9)::DECIMAL(28,9))::DOUBLE AS sww
      FROM rows_w
    )
    SELECT n_sample, naive_mean,
           round(swv / sw, 6) AS weighted_mean,
           round(sw * sw / sww, 6) AS n_eff,
           round((SELECT coalesce(sum(np), 0) FROM pop_c
                  WHERE s NOT IN (SELECT s FROM smp_c))
                 / (SELECT tp FROM tot), 6) AS uncovered_pop_share
    FROM agg
    """,
)
def x10_post_stratification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — post-stratification repair of a biased sample (round 8):
    a deterministic md5-coin sample that OVERSAMPLES purchases 3×
    (the convenience-sample failure mode), reweighted so every event
    type counts at its population share — the weighted mean recovers
    the population-representative value where the naive mean is
    pulled toward the oversampled stratum, and the Kish n_eff prices
    the variance cost of the fix. Two stratum-count folds + one
    value fold; weights are exact count rationals rounded to 9
    (operators/scale.py:post_stratify)."""
    from vectordb_migrator_spark.operators.scale import post_stratify

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ps:"), F.col("event_id"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    smp = ev.filter(
        coin
        < F.when(F.col("event_type") == "purchase", 6).otherwise(2)
    )
    return post_stratify(
        smp, ev, stratum_col="event_type", value_col="value"
    )


@query(
    "x9_effective_dim",
    """
    WITH e AS (
      SELECT embedding::DOUBLE[] AS v FROM embeddings
    ), ex AS (
      SELECT u.i AS dim, round(e.v[u.i], 6)::DECIMAL(18,6) AS x
      FROM e, unnest(range(1, len(e.v) + 1)) u(i)
    ), m AS (
      SELECT dim, count(*)::BIGINT AS n,
             sum(x)::DECIMAL(38,6) AS s,
             sum(x::DECIMAL(19,6) * x::DECIMAL(19,6))::DECIMAL(38,12)
               AS ss
      FROM ex GROUP BY dim
    ), vper AS (
      SELECT dim,
             round(ss::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n),
                   9) AS var_d
      FROM m
    ), agg AS (
      SELECT count(*)::BIGINT AS n_dims,
             sum(var_d::DECIMAL(28,9))::DOUBLE AS sv,
             sum((var_d * var_d)::DECIMAL(28,18))::DOUBLE AS svv,
             max(var_d) AS vmax, min(var_d) AS vmin
      FROM vper
    )
    SELECT n_dims,
           round(sv, 6) AS total_variance,
           round(sv * sv / svv, 6) AS effective_dim,
           round(sv * sv / svv / n_dims, 6) AS dim_utilization,
           round(vmax, 6) AS max_dim_var,
           round(vmin, 6) AS min_dim_var
    FROM agg
    """,
)
def x9_effective_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — effective dimensionality of the embedding space
    (round 8): the participation ratio (Σv_d)²/Σv_d² over per-
    dimension variances — the diagonal (rotation-free) estimate of
    how many dimensions the corpus actually uses, the one-row health
    check that says whether Matryoshka truncation and PQ subspace
    splits have headroom (utilization ≈ 1 = isotropic, « 1 = a few
    dims carry everything; the eigenvalue version lives in the
    rows-only PCA family — this diagonal form keeps a full oracle).
    One explode + one (dim) moment fold, decimal-exact
    (variances round to 9 before the ratio)."""
    ex = (
        _t(spark, sf_dir, "embeddings")
        .select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim0", "x"
            )
        )
        .select(
            (F.col("dim0") + 1).alias("dim"),
            F.round(F.col("x"), 6).cast("decimal(18,6)").alias("x"),
        )
    )
    x19 = F.col("x").cast("decimal(19,6)")
    m = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(38,6)").alias("s"),
        F.sum(x19 * x19).cast("decimal(38,12)").alias("ss"),
    )
    n = F.col("n").cast("double")
    var_d = F.round(
        F.col("ss").cast("double") / n
        - (F.col("s").cast("double") / n) * (F.col("s").cast("double") / n),
        9,
    )
    vper = m.select(var_d.alias("var_d"))
    sv = F.sum(F.col("var_d").cast("decimal(28,9)")).cast("double")
    svv = F.sum(
        (F.col("var_d") * F.col("var_d")).cast("decimal(28,18)")
    ).cast("double")
    return vper.agg(
        F.count(F.lit(1)).cast("long").alias("n_dims"),
        F.round(sv, 6).alias("total_variance"),
        F.round(sv * sv / svv, 6).alias("effective_dim"),
        F.round(sv * sv / svv / F.count(F.lit(1)), 6).alias(
            "dim_utilization"
        ),
        F.round(F.max("var_d"), 6).alias("max_dim_var"),
        F.round(F.min("var_d"), 6).alias("min_dim_var"),
    )


_ENC_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate"]


def _encoding_advisor_sql() -> str:
    parts = [
        f"""
    SELECT '{c}' AS column_name,
           count(*)::BIGINT AS n_rows,
           count(DISTINCT {c})::BIGINT AS ndv,
           round(ceil(log2(greatest(count(DISTINCT {c}), 2))), 6)
             AS dict_code_bits,
           round((SELECT -sum(round(p * log2(p), 9)::DECIMAL(28,9))
                  FROM (SELECT count(*)::DOUBLE
                               / (SELECT count(*) FROM orders) AS p
                        FROM orders GROUP BY {c}))::DOUBLE, 6)
             AS entropy_bits,
           round((SELECT -sum(round(p * log2(p), 9)::DECIMAL(28,9))
                  FROM (SELECT count(*)::DOUBLE
                               / (SELECT count(*) FROM orders) AS p
                        FROM orders GROUP BY {c}))::DOUBLE, 6)
             < 0.5 * round(ceil(log2(greatest(count(DISTINCT {c}), 2))), 6)
             AS rle_dict_win
    FROM orders"""
        for c in _ENC_COLS
    ]
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY column_name"
    )


@query("x12_encoding_advisor", _encoding_advisor_sql())
def x12_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — column-encoding advisor (round 8): per column, exact
    ndv, the dictionary code width ceil(log2 ndv), and the value
    distribution's Shannon entropy — when entropy sits far below the
    code width (skewed distributions), dictionary+RLE pages compress
    massively and the column is a clustering candidate; when entropy
    ≈ code width (near-uniform), dictionary encoding buys little
    beyond the width itself. The measured input to parquet encoding
    and sort-order decisions, next to ``x12_layout_advisor``'s
    cardinality heuristics. One grouped count per column folds to a
    value-distribution frame; entropy terms round to 9 and sum as
    decimals."""
    docs = _t(spark, sf_dir, "orders")
    n_rows = docs.count()
    out = None
    for c in _ENC_COLS:
        dist = docs.groupBy(c).agg(F.count(F.lit(1)).alias("__n"))
        p = F.col("__n").cast("double") / F.lit(float(n_rows))
        ent = F.sum(
            F.round(-p * F.log2(p), 9).cast("decimal(28,9)")
        ).cast("double")
        row = dist.agg(
            F.lit(c).alias("column_name"),
            F.lit(n_rows).cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("ndv"),
            F.round(
                F.ceil(F.log2(F.greatest(F.count(F.lit(1)), F.lit(2))))
                .cast("double"),
                6,
            ).alias("dict_code_bits"),
            F.round(ent, 6).alias("entropy_bits"),
            (
                F.round(ent, 6)
                < F.lit(0.5)
                * F.round(
                    F.ceil(
                        F.log2(F.greatest(F.count(F.lit(1)), F.lit(2)))
                    ).cast("double"),
                    6,
                )
            ).alias("rle_dict_win"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("column_name")


@query(
    "x9_pq_code_balance",
    """
    WITH cb AS (SELECT vec_id AS j, embedding::DOUBLE[] AS cv
                FROM embeddings WHERE vec_id < 16),
    d AS (
      SELECT e.vec_id, (t.i-1) // 16 AS s, c.j,
             sum((e.embedding[t.i]::DOUBLE - c.cv[t.i]) *
                 (e.embedding[t.i]::DOUBLE - c.cv[t.i])) AS dist
      FROM embeddings e, range(1, 65) t(i), cb c
      GROUP BY e.vec_id, (t.i-1) // 16, c.j
    ),
    code AS (
      SELECT vec_id, s, j FROM (
        SELECT vec_id, s, j,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist, j) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    hist AS (
      SELECT s, j, count(*)::BIGINT AS n FROM code GROUP BY s, j
    ),
    tot AS (SELECT s, sum(n)::DOUBLE AS t FROM hist GROUP BY s)
    SELECT h.s::INT AS subspace,
           (SELECT t FROM tot WHERE tot.s = h.s)::BIGINT AS n_vectors,
           count(*)::BIGINT AS codes_used,
           round(count(*) / 16.0, 6) AS utilization,
           round(-sum(round((h.n / (SELECT t FROM tot WHERE tot.s = h.s))
                            * log2(h.n / (SELECT t FROM tot
                                          WHERE tot.s = h.s)), 9)
                      ::DECIMAL(28,9))::DOUBLE, 6) AS code_entropy,
           round(max(h.n) / (SELECT t FROM tot WHERE tot.s = h.s), 6)
             AS max_cell_share
    FROM hist h GROUP BY h.s ORDER BY subspace
    """,
)
def x9_pq_code_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — PQ codebook-utilization diagnostic (round 8): per
    subspace, how many of the 16 codewords the corpus actually uses,
    the code histogram's entropy against the 4-bit budget, and the
    hottest cell's share — a collapsed codebook (few codes, low
    entropy) is the failure mode behind bad ADC recall, and this row
    is how you see it without running a recall sweep. Codes are the
    same deterministic sampled-codebook assignment the ADC queries
    use (oracle rebuilds them from the data alone); one (s, j) count
    fold on top (operators/similarity.py:pq_encode)."""
    from pyspark.sql import Window as W

    from vectordb_migrator_spark.operators.similarity import (
        pq_encode,
        pq_sampled_codebooks,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    emb = fan_out(_t(spark, sf_dir, "embeddings"))
    codebooks = pq_sampled_codebooks(emb, m=4, k=16)
    codes = pq_encode(emb, codebooks).select(
        F.posexplode("pq_code").alias("subspace", "j")
    )
    hist = codes.groupBy("subspace", "j").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = F.sum("n").over(W.partitionBy("subspace"))
    h = hist.withColumn("__t", tot.cast("double"))
    p = F.col("n").cast("double") / F.col("__t")
    return (
        h.groupBy("subspace")
        .agg(
            F.max("__t").cast("long").alias("n_vectors"),
            F.count(F.lit(1)).cast("long").alias("codes_used"),
            F.round(F.count(F.lit(1)) / F.lit(16.0), 6).alias(
                "utilization"
            ),
            F.round(
                -F.sum(
                    F.round(p * F.log2(p), 9).cast("decimal(28,9)")
                ).cast("double"),
                6,
            ).alias("code_entropy"),
            F.round(F.max("n").cast("double") / F.max("__t"), 6).alias(
                "max_cell_share"
            ),
        )
        .withColumn("subspace", F.col("subspace").cast("int"))
        .select(
            "subspace",
            "n_vectors",
            "codes_used",
            "utilization",
            "code_entropy",
            "max_cell_share",
        )
        .orderBy("subspace")
    )


@query(
    "x13_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT ts::DATE AS day, user_id AS u
      FROM events WHERE user_id IS NOT NULL
    ), days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY day),
    wau AS (
      SELECT d.day, count(DISTINCT ud.u)::BIGINT AS wau
      FROM days d JOIN ud
        ON ud.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           round(dau.dau::DOUBLE / wau.wau, 6) AS stickiness
    FROM days d JOIN dau USING (day) JOIN wau USING (day)
    ORDER BY day
    """,
)
def x13_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — DAU/WAU stickiness (round 8): per day, distinct active
    users, trailing-7-day distinct actives, and their ratio — the
    product-analytics engagement staple (stickiness ≈ how many of
    the weekly base returns daily). Scale shape: the event log folds
    ONCE to the distinct (day, user) frame; the trailing-7 distinct
    is a days×7 range join over that id-width frame (sliding
    DISTINCT cannot be a plain window — re-counting users across the
    window is the point), then one count per anchor day. Full
    oracle."""
    ud = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.to_date("ts").alias("day"), F.col("user_id").alias("u")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    anchor = days.withColumnRenamed("day", "__anchor")
    wau = (
        anchor.join(
            ud,
            (F.col("day") >= F.date_sub(F.col("__anchor"), 6))
            & (F.col("day") <= F.col("__anchor")),
        )
        .groupBy("__anchor")
        .agg(F.countDistinct("u").cast("long").alias("wau"))
        .withColumnRenamed("__anchor", "day")
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


@query(
    "x7_chi2_independence",
    """
    WITH t AS (
      SELECT event_type AS r,
             CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS c
      FROM events WHERE user_id IS NOT NULL
    ), cell AS (
      SELECT r, c, count(*)::BIGINT AS n FROM t GROUP BY r, c
    ), mar AS (
      SELECT cell.r, cell.c, cell.n,
             sum(cell.n) OVER (PARTITION BY cell.r) AS nr,
             sum(cell.n) OVER (PARTITION BY cell.c) AS nc,
             sum(cell.n) OVER () AS nt
      FROM cell
    ), chi AS (
      SELECT sum(round(
               (n - nr::DOUBLE * nc / nt) * (n - nr::DOUBLE * nc / nt)
               / (nr::DOUBLE * nc / nt), 9)::DECIMAL(28,9))::DOUBLE
               AS chi2,
             count(DISTINCT r)::BIGINT AS n_rows_dim,
             count(DISTINCT c)::BIGINT AS n_cols_dim,
             max(nt)::BIGINT AS n_total
      FROM mar
    )
    SELECT n_total, n_rows_dim, n_cols_dim,
           ((n_rows_dim - 1) * (n_cols_dim - 1))::BIGINT AS dof,
           round(chi2, 6) AS chi2,
           round(chi2, 6) > 9.487729 AS significant
    FROM chi
    """,
)
def x7_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — R×C chi-square test of independence (round 8): is event
    type distributed independently of the variant? The contingency
    generalization of the 2-proportion SRM gate (here 5×2, dof 4,
    critical 9.487729 at p<.05) — the one-row check that the variant
    did not change the SHAPE of user behavior even when every
    per-type rate gate stays green. One (r, c) count aggregate
    collapses the corpus; expected counts and the chi2 fold run on
    the cells frame with round-9 decimal term sums. Full oracle."""
    from pyspark.sql import Window as W

    t = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.col("event_type").alias("r"),
            F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias(
                "c"
            ),
        )
    )
    cell = t.groupBy("r", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    nr = F.sum("n").over(W.partitionBy("r")).cast("double")
    nc = F.sum("n").over(W.partitionBy("c")).cast("double")
    nt = F.sum("n").over(W.partitionBy()).cast("double")
    e = nr * nc / nt
    mar = cell.select(
        "r",
        "c",
        "n",
        F.round((F.col("n") - e) * (F.col("n") - e) / e, 9)
        .cast("decimal(28,9)")
        .alias("__term"),
        nt.cast("long").alias("__nt"),
    )
    chi = mar.agg(
        F.max("__nt").cast("long").alias("n_total"),
        F.countDistinct("r").cast("long").alias("n_rows_dim"),
        F.countDistinct("c").cast("long").alias("n_cols_dim"),
        F.sum("__term").cast("double").alias("__chi2"),
    )
    return chi.select(
        "n_total",
        "n_rows_dim",
        "n_cols_dim",
        ((F.col("n_rows_dim") - 1) * (F.col("n_cols_dim") - 1))
        .cast("long")
        .alias("dof"),
        F.round("__chi2", 6).alias("chi2"),
        (F.round("__chi2", 6) > F.lit(9.487729)).alias("significant"),
    )


@query(
    "x1_dup_token_mass",
    r"""
    WITH t AS (
      SELECT doc_id, md5(text) AS fp,
             len(list_filter(string_split_regex(lower(trim(text)),
                                                '\s+'),
                             x -> x <> ''))::BIGINT AS n_tok
      FROM documents
    ), g AS (
      SELECT fp, count(*)::BIGINT AS copies,
             sum(n_tok)::BIGINT AS toks,
             min(n_tok)::BIGINT AS keeper_toks
      FROM t GROUP BY fp
    )
    SELECT count(*)::BIGINT AS n_groups,
           sum(copies)::BIGINT AS n_docs,
           sum(toks)::BIGINT AS total_tokens,
           sum(toks - keeper_toks)::BIGINT AS duplicate_tokens,
           round(sum(toks - keeper_toks)::DOUBLE / sum(toks), 6)
             AS dup_token_share,
           sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END)::BIGINT
             AS dup_groups
    FROM g
    """,
)
def x1_dup_token_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — exact-dup TOKEN mass (round 8): the dedup ROI in the
    currency that matters — what share of corpus tokens are duplicate
    copies (training compute and storage pay per token, not per
    document; a few duplicated long documents can dominate a dup-rate
    number computed over docs). One fingerprint fold; identical texts
    have identical token counts, so keeper tokens = min per group.
    Full oracle."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda x: x != F.lit(""),
        )
    ).cast("long")
    t = docs.select(F.md5("text").alias("fp"), toks.alias("n_tok"))
    g = t.groupBy("fp").agg(
        F.count(F.lit(1)).cast("long").alias("copies"),
        F.sum("n_tok").cast("long").alias("toks"),
        F.min("n_tok").cast("long").alias("keeper_toks"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("copies").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.sum(F.col("toks") - F.col("keeper_toks"))
        .cast("long")
        .alias("duplicate_tokens"),
        F.round(
            F.sum(F.col("toks") - F.col("keeper_toks"))
            / F.sum("toks").cast("double"),
            6,
        ).alias("dup_token_share"),
        F.sum((F.col("copies") > 1).cast("long"))
        .cast("long")
        .alias("dup_groups"),
    )


@query(
    "x2_cluster_purity",
    _NGRAM_PAIRS_CTE.replace("WITH sh AS", "WITH RECURSIVE sh AS")
    + """
    , reach AS (
      SELECT u AS a, v AS b FROM e
      UNION
      SELECT r.a, e.v FROM reach r JOIN e ON r.b = e.u
    ), comp AS (
      SELECT a AS id, least(a, min(b))::BIGINT AS comp
      FROM reach GROUP BY a
    ), mem AS (
      SELECT c.comp, c.id, d.source
      FROM comp c JOIN documents d ON d.doc_id = c.id
    ), per AS (
      SELECT comp, source, count(*)::BIGINT AS n FROM mem
      GROUP BY comp, source
    ), agg AS (
      SELECT comp, sum(n)::BIGINT AS size,
             count(*)::BIGINT AS n_sources,
             max(n)::BIGINT AS top_n
      FROM per GROUP BY comp
    )
    SELECT comp, size, n_sources,
           round(top_n::DOUBLE / size, 6) AS purity,
           n_sources > 1 AS cross_source
    FROM agg ORDER BY comp
    """,
)
def x2_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — dup-family source purity (round 8): per near-dup
    component, how many sources its members span and the majority-
    source share — the closure-level view of what
    ``x2_source_overlap_matrix`` shows pairwise: a family spanning
    sources is content laundering or syndication (one copy should
    survive corpus-wide), a pure family is intra-source
    re-publication (dedup locally). Pair kernel + CC shuffle ids
    only; the source join is duplicate-sized. Full recursive-CTE
    oracle (operators/graph.py:connected_components)."""
    from vectordb_migrator_spark.operators.graph import (
        connected_components,
    )
    from pyspark.sql import Window as W

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2).localCheckpoint(
        eager=True
    )
    comp = connected_components(pairs)
    mem = comp.join(
        docs.select(F.col("doc_id").alias("id"), "source"), "id"
    )
    per = mem.groupBy("comp", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        per.groupBy("comp")
        .agg(
            F.sum("n").cast("long").alias("size"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.max("n").cast("long").alias("__top"),
        )
        .select(
            "comp",
            "size",
            "n_sources",
            F.round(F.col("__top") / F.col("size").cast("double"), 6).alias(
                "purity"
            ),
            (F.col("n_sources") > 1).alias("cross_source"),
        )
        .orderBy("comp")
    )


@query(
    "x9_norm_profile",
    """
    WITH n AS (
      SELECT vec_id,
             round(sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])), 6)
               AS l2
      FROM embeddings
    )
    SELECT count(*)::BIGINT AS n_vectors,
           round(avg(l2), 6) AS mean_norm,
           round(stddev_pop(l2), 6) AS sd_norm,
           round(quantile_cont(l2, 0.05), 6) AS p05,
           round(quantile_cont(l2, 0.5), 6) AS p50,
           round(quantile_cont(l2, 0.95), 6) AS p95,
           sum(CASE WHEN l2 < 1e-6 THEN 1 ELSE 0 END)::BIGINT
             AS near_zero,
           round(stddev_pop(l2) / avg(l2), 6) AS norm_cv,
           stddev_pop(l2) / avg(l2) < 0.01 AS looks_normalized
    FROM n
    """,
)
def x9_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — embedding L2-norm profile (round 8): the one-row "did
    normalization happen" gate every embedding ingest needs before
    cosine math is trusted — mean/sd/percentiles of the norm, the
    count of near-zero vectors (which poison cosine with NULLs or
    garbage), and a normalized verdict when the coefficient of
    variation sits under 1%. One narrow scan; norms round to 6
    before the fold so the profile is engine-stable. Full oracle."""
    e = _t(spark, sf_dir, "embeddings")
    l2 = F.round(
        F.sqrt(
            F.aggregate(
                F.col("embedding").cast("array<double>"),
                F.lit(0.0),
                lambda s, x: s + x * x,
            )
        ),
        6,
    )
    n = e.select(l2.alias("l2"))
    cv = F.stddev_pop("l2") / F.avg("l2")
    return n.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(F.avg("l2"), 6).alias("mean_norm"),
        F.round(F.stddev_pop("l2"), 6).alias("sd_norm"),
        F.round(F.expr("percentile(l2, 0.05)"), 6).alias("p05"),
        F.round(F.expr("percentile(l2, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l2, 0.95)"), 6).alias("p95"),
        F.sum((F.col("l2") < 1e-6).cast("long"))
        .cast("long")
        .alias("near_zero"),
        F.round(cv, 6).alias("norm_cv"),
        (cv < 0.01).alias("looks_normalized"),
    )


@query(
    "x5_encoding_artifacts",
    r"""
    WITH t AS (
      SELECT doc_id, length(text)::BIGINT AS n_chars,
             length(regexp_replace(text, '[^\x00-\x08\x0B\x0C\x0E-\x1F]',
                                   '', 'g'))::BIGINT AS ctrl,
             length(regexp_replace(text, '[^�]', '', 'g'))::BIGINT
               AS repl
      FROM documents
    )
    SELECT count(*)::BIGINT AS n_docs,
           sum(CASE WHEN ctrl > 0 OR repl > 0 THEN 1 ELSE 0 END)
             ::BIGINT AS dirty_docs,
           sum(ctrl)::BIGINT AS control_chars,
           sum(repl)::BIGINT AS replacement_chars,
           round(sum(CASE WHEN ctrl > 0 OR repl > 0 THEN 1 ELSE 0 END)
                 ::DOUBLE / count(*), 6) AS dirty_share,
           round(sum(ctrl + repl)::DOUBLE
                 / greatest(sum(n_chars), 1), 6) AS artifact_char_rate
    FROM t
    """,
)
def x5_encoding_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — encoding-artifact gate (round 8): counts of control
    characters and U+FFFD replacement characters (the scar tissue of
    a bad decode step upstream) per corpus — mojibake correlates with
    wholesale pipeline breakage, so a nonzero artifact rate on a new
    source is a quarantine trigger before any quality model wastes
    compute scoring garbage. Pure codegen regex counting on one scan;
    tab/newline stay legal (the character classes exclude them).
    Full oracle."""
    docs = _t(spark, sf_dir, "documents")
    ctrl = F.length(
        F.regexp_replace(
            F.col("text"), r"[^\x00-\x08\x0B\x0C\x0E-\x1F]", ""
        )
    ).cast("long")
    repl = F.length(
        F.regexp_replace(F.col("text"), "[^�]", "")
    ).cast("long")
    t = docs.select(
        F.length("text").cast("long").alias("n_chars"),
        ctrl.alias("ctrl"),
        repl.alias("repl"),
    )
    dirty = ((F.col("ctrl") > 0) | (F.col("repl") > 0)).cast("long")
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(dirty).cast("long").alias("dirty_docs"),
        F.sum("ctrl").cast("long").alias("control_chars"),
        F.sum("repl").cast("long").alias("replacement_chars"),
        F.round(F.sum(dirty) / F.count(F.lit(1)).cast("double"), 6).alias(
            "dirty_share"
        ),
        F.round(
            (F.sum("ctrl") + F.sum("repl"))
            / F.greatest(F.sum("n_chars"), F.lit(1)).cast("double"),
            6,
        ).alias("artifact_char_rate"),
    )


@query(
    "x5_oov_rate",
    r"""
    WITH tok AS (
      SELECT lang, u.w AS w
      FROM (SELECT lang,
                   list_filter(string_split_regex(lower(trim(text)),
                                                  '\s+'),
                               x -> x <> '') AS toks
            FROM documents) d, unnest(d.toks) u(w)
    ), vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, w) AS rk
        FROM tok GROUP BY w
      ) WHERE rk <= 1000
    )
    SELECT lang,
           count(*)::BIGINT AS n_tokens,
           sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS oov_tokens,
           round(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS oov_rate
    FROM tok LEFT JOIN vocab v USING (w)
    GROUP BY lang ORDER BY lang
    """,
)
def x5_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — out-of-vocabulary rate per language (round 8): fix the
    top-1000 corpus-wide vocabulary (count-desc, word tie-break) and
    measure each language's token share outside it — the
    tokenizer-fit signal that shows which slices a shared vocab
    under-serves (their text will fragment into more subwords and pay
    more compute per byte). One token fold builds the vocab; the OOV
    pass is a broadcast-sized left join against the 1000-row vocab.
    Full oracle."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    tok = docs.select("lang", F.explode(toks).alias("w"))
    from pyspark.sql import Window as W

    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rk",
            F.row_number().over(W.orderBy(F.desc("n"), F.asc("w"))),
        )
        .filter(F.col("rk") <= 1000)
        .select("w", F.lit(1).alias("__in"))
    )
    j = tok.join(F.broadcast(vocab), "w", "left")
    oov = F.col("__in").isNull().cast("long")
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(oov).cast("long").alias("oov_tokens"),
            F.round(
                F.sum(oov) / F.count(F.lit(1)).cast("double"), 6
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )



_ROWDUP_COLS = {
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "orders": [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ],
}


def _row_dupes_sql() -> str:
    """Oracle for x12_row_dupes: the distinct count of row
    fingerprints equals the distinct count of row tuples whenever the
    per-column string cast is injective WITHIN the engine — which it
    is for these types (shortest-roundtrip floats, canonical
    dates/timestamps) — so the counts agree even though the two
    engines' string renderings differ."""
    parts = []
    for t, cols in _ROWDUP_COLS.items():
        fp = ", ".join(
            f"coalesce({c}::VARCHAR, chr(0))" for c in cols
        )
        parts.append(f"""
    SELECT '{t}' AS table_name,
           count(*)::BIGINT AS n_rows,
           count(DISTINCT concat_ws(chr(31), {fp}))::BIGINT
             AS distinct_rows,
           (count(*) - count(DISTINCT concat_ws(chr(31), {fp})))
             ::BIGINT AS duplicate_rows,
           round((count(*)
                  - count(DISTINCT concat_ws(chr(31), {fp})))::DOUBLE
                 / count(*), 6) AS dup_row_rate
    FROM {t}""")
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY table_name"
    )


@query("x12_row_dupes", _row_dupes_sql())
def x12_row_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — full-row duplicate audit (round 8): per table, how many
    physical rows are exact copies of another — the double-load /
    replayed-batch detector (a replay that slipped past an
    idempotence guard shows up here before it shows up as doubled
    revenue). One count-distinct over a null-tagged row fingerprint
    per table; the distinct count is cast-injectivity-invariant, so
    it carries a full oracle even though the engines render values
    differently."""
    out = None
    for t, cols in _ROWDUP_COLS.items():
        df = _t(spark, sf_dir, t)
        fp = F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in cols
            ],
        )
        row = df.agg(
            F.lit(t).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(fp).cast("long").alias("distinct_rows"),
        ).select(
            "table_name",
            "n_rows",
            "distinct_rows",
            (F.col("n_rows") - F.col("distinct_rows"))
            .cast("long")
            .alias("duplicate_rows"),
            F.round(
                (F.col("n_rows") - F.col("distinct_rows"))
                / F.col("n_rows").cast("double"),
                6,
            ).alias("dup_row_rate"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")


@query(
    "x12_timestamp_audit",
    """
    WITH t AS (
      SELECT ts,
             CASE WHEN epoch(ts) <= 0 THEN 1 ELSE 0 END AS epoch_zero,
             CASE WHEN ts > TIMESTAMP '2026-01-01' THEN 1 ELSE 0 END
               AS future,
             CASE WHEN date_trunc('day', ts) = ts THEN 1 ELSE 0 END
               AS midnight
      FROM events
    )
    SELECT count(*)::BIGINT AS n_rows,
           sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS null_ts,
           sum(epoch_zero)::BIGINT AS epoch_zero_rows,
           sum(future)::BIGINT AS future_rows,
           sum(midnight)::BIGINT AS midnight_rows,
           round(sum(midnight)::DOUBLE / count(*), 6)
             AS midnight_share,
           round(sum(midnight)::DOUBLE / count(*), 6) > 0.1
             AS truncation_suspected
    FROM t
    """,
)
def x12_timestamp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — timestamp sanity audit (round 8): NULLs, epoch-zero
    sentinels (1970 rows = a failed parse defaulted), future rows
    (clock skew or unit confusion — ms read as s lands in 50,000 AD,
    s read as ms lands in 1970), and the exact-midnight share — a
    midnight spike means some upstream truncated timestamps to dates,
    which silently breaks every sessionization and inter-arrival
    statistic downstream. One aggregate over one scan, the
    quality-constraints shape. Full oracle (the future cutoff is a
    fixed literal, not now(), so the row is reproducible)."""
    ev = _t(spark, sf_dir, "events")
    midnight = (
        F.date_trunc("day", F.col("ts")) == F.col("ts")
    ).cast("long")
    epoch_zero = (F.col("ts").cast("double") <= 0).cast("long")
    future = (
        F.col("ts") > F.lit("2026-01-01").cast("timestamp")
    ).cast("long")
    return ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("ts").isNull().cast("long"))
        .cast("long")
        .alias("null_ts"),
        F.coalesce(F.sum(epoch_zero), F.lit(0))
        .cast("long")
        .alias("epoch_zero_rows"),
        F.coalesce(F.sum(future), F.lit(0))
        .cast("long")
        .alias("future_rows"),
        F.coalesce(F.sum(midnight), F.lit(0))
        .cast("long")
        .alias("midnight_rows"),
        F.round(
            F.coalesce(F.sum(midnight), F.lit(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("midnight_share"),
        (
            F.round(
                F.coalesce(F.sum(midnight), F.lit(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            )
            > 0.1
        ).alias("truncation_suspected"),
    )


@query(
    "x10_split_balance",
    """
    WITH t AS (
      SELECT lang AS r,
             CASE
               WHEN CAST(CONCAT('0x', substr(md5(concat('split:', doc_id)),
                                             1, 8)) AS BIGINT)
                    / 4294967296.0 < 0.8 THEN 'train'
               WHEN CAST(CONCAT('0x', substr(md5(concat('split:', doc_id)),
                                             1, 8)) AS BIGINT)
                    / 4294967296.0 < 0.9 THEN 'val'
               ELSE 'test'
             END AS c
      FROM documents
    ), cell AS (
      SELECT r, c, count(*)::BIGINT AS n FROM t GROUP BY r, c
    ), mar AS (
      SELECT cell.r, cell.c, cell.n,
             sum(cell.n) OVER (PARTITION BY cell.r) AS nr,
             sum(cell.n) OVER (PARTITION BY cell.c) AS nc,
             sum(cell.n) OVER () AS nt
      FROM cell
    ), chi AS (
      SELECT sum(round(
               (n - nr::DOUBLE * nc / nt) * (n - nr::DOUBLE * nc / nt)
               / (nr::DOUBLE * nc / nt), 9)::DECIMAL(28,9))::DOUBLE
               AS chi2,
             count(DISTINCT r)::BIGINT AS n_langs,
             max(nt)::BIGINT AS n_docs
      FROM mar
    )
    SELECT n_docs, n_langs,
           ((n_langs - 1) * 2)::BIGINT AS dof,
           round(chi2, 6) AS chi2,
           round(chi2, 6) > 15.507313 AS imbalance_suspected
    FROM chi
    """,
)
def x10_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — split-balance certificate (round 8): chi-square
    independence of language × md5-coin train/val/test assignment —
    the check that the deterministic splitter did not accidentally
    correlate with a stratum (a lang-skewed eval set silently biases
    every benchmark number downstream). Uses the SAME split
    expression as ``x0_training_manifest``, so this certifies the
    split the pipeline actually ships; critical value 15.507 = p<.05
    at dof 8 (5 langs × 3 splits). One (lang, split) count aggregate;
    the chi2 folds on the cells frame. Full oracle."""
    from pyspark.sql import Window as W

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    t = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("r"),
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
        .alias("c"),
    )
    cell = t.groupBy("r", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    nr = F.sum("n").over(W.partitionBy("r")).cast("double")
    nc = F.sum("n").over(W.partitionBy("c")).cast("double")
    nt = F.sum("n").over(W.partitionBy()).cast("double")
    e = nr * nc / nt
    mar = cell.select(
        "r",
        F.round((F.col("n") - e) * (F.col("n") - e) / e, 9)
        .cast("decimal(28,9)")
        .alias("__term"),
        nt.cast("long").alias("__nt"),
    )
    chi = mar.agg(
        F.max("__nt").cast("long").alias("n_docs"),
        F.countDistinct("r").cast("long").alias("n_langs"),
        F.sum("__term").cast("double").alias("__chi2"),
    )
    return chi.select(
        "n_docs",
        "n_langs",
        ((F.col("n_langs") - 1) * 2).cast("long").alias("dof"),
        F.round("__chi2", 6).alias("chi2"),
        (F.round("__chi2", 6) > F.lit(15.507313)).alias(
            "imbalance_suspected"
        ),
    )


@query(
    "x0_context_fit",
    r"""
    WITH t AS (
      SELECT len(list_filter(string_split_regex(lower(trim(text)),
                                                '\s+'),
                             x -> x <> ''))::BIGINT AS n_tok
      FROM documents
    ), w AS (
      SELECT u.win AS context FROM (VALUES (64), (128), (256), (512))
        u(win)
    )
    SELECT w.context::BIGINT AS context,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN n_tok <= w.context THEN 1 ELSE 0 END)::BIGINT
             AS fits,
           round(sum(CASE WHEN n_tok <= w.context THEN 1 ELSE 0 END)
                 ::DOUBLE / count(*), 6) AS fit_share,
           sum(greatest(n_tok - w.context, 0))::BIGINT
             AS truncated_tokens,
           round(sum(greatest(n_tok - w.context, 0))::DOUBLE
                 / sum(n_tok), 6) AS token_loss_share
    FROM t, w GROUP BY w.context ORDER BY context
    """,
)
def x0_context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — context-window fit report (round 8): per candidate window
    (64/128/256/512 tokens), the share of documents that fit whole
    and the token mass a hard truncation would discard — the
    measured input to the chunk-vs-truncate decision and the
    complement of ``x0_doc_packing`` (packing asks how to fill
    windows; this asks what each window size costs in lost text).
    One token-count fold crossed with the 4-row window frame. Full
    oracle."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda x: x != F.lit(""),
        )
    ).cast("long")
    t = docs.select(n_tok.alias("n_tok"))
    w = spark.createDataFrame(
        [(64,), (128,), (256,), (512,)], "context long"
    )
    j = t.crossJoin(F.broadcast(w))
    fits = (F.col("n_tok") <= F.col("context")).cast("long")
    lost = F.greatest(F.col("n_tok") - F.col("context"), F.lit(0))
    return (
        j.groupBy("context")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(fits).cast("long").alias("fits"),
            F.round(
                F.sum(fits) / F.count(F.lit(1)).cast("double"), 6
            ).alias("fit_share"),
            F.sum(lost).cast("long").alias("truncated_tokens"),
            F.round(
                F.sum(lost) / F.sum("n_tok").cast("double"), 6
            ).alias("token_loss_share"),
        )
        .orderBy("context")
    )


@query(
    "x5_boilerplate_mass",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
             array_to_string(toks[i:i+2], ' ') AS gram
      FROM t, unnest(range(1, len(toks) - 1)) u(i)
      WHERE len(toks) >= 3
    ), df AS (
      SELECT gram, count(DISTINCT doc_id)::BIGINT AS n_docs,
             count(*)::BIGINT AS occ
      FROM g GROUP BY gram
    )
    SELECT sum(occ)::BIGINT AS total_gram_occurrences,
           count(*)::BIGINT AS distinct_grams,
           sum(CASE WHEN n_docs >= 20 THEN occ ELSE 0 END)::BIGINT
             AS boilerplate_occurrences,
           sum(CASE WHEN n_docs >= 20 THEN 1 ELSE 0 END)::BIGINT
             AS boilerplate_grams,
           round(sum(CASE WHEN n_docs >= 20 THEN occ ELSE 0 END)
                 ::DOUBLE / sum(occ), 6) AS boilerplate_share
    FROM df
    """,
)
def x5_boilerplate_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — boilerplate gram mass (round 8): what share of all 3-gram
    occurrences belongs to grams appearing in >= 20 documents — the
    single number that says how much of the corpus is template
    scaffolding (headers, footers, licenses) rather than content,
    and therefore what a boilerplate-removal pass
    (``x5_boilerplate_removal``) stands to reclaim; ``x5_hot_grams``
    names the offenders, this prices them. One gram fold with a
    per-gram (df, occurrences) aggregate. Full oracle."""
    docs = _t(spark, sf_dir, "documents")
    # shingles() dedups per doc; occurrence mass needs RAW grams, so
    # the zip chain below keeps duplicates (same gram expression,
    # minus the array_distinct)
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    raw = docs.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
                    F.slice(toks, 2, F.greatest(F.size(toks) - 2, F.lit(0))),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
                F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram"),
    )
    df = raw.groupBy("gram").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("occ"),
    )
    hot = (F.col("n_docs") >= 20).cast("long")
    return df.agg(
        F.sum("occ").cast("long").alias("total_gram_occurrences"),
        F.count(F.lit(1)).cast("long").alias("distinct_grams"),
        F.sum(F.col("occ") * hot).cast("long").alias(
            "boilerplate_occurrences"
        ),
        F.sum(hot).cast("long").alias("boilerplate_grams"),
        F.round(
            F.sum(F.col("occ") * hot) / F.sum("occ").cast("double"), 6
        ).alias("boilerplate_share"),
    )


def _detector_recall_sql() -> str:
    """Oracle for x2_detector_recall: plant insert-shifted copies of
    the 50 lowest-id documents (id + 100000, a fixed prefix), then
    replay BOTH detector kernels over the augmented corpus and count
    recovered planted pairs per detector."""
    aug = r"""
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000,
             'planted prefix sentence for recall measurement ' || text
      FROM documents WHERE doc_id < 50
    ), t AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM aug
    ), sh AS (
      SELECT id, list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks) - 1)]) AS g
      FROM t WHERE len(toks) >= 3
    ), ex AS (
      SELECT id, len(g)::BIGINT AS n, unnest(g) AS gram FROM sh
    ), jacc AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
      GROUP BY a.id, b.id
      HAVING count(*)::DOUBLE /
             (any_value(a.n) + any_value(b.n) - count(*))::DOUBLE
             >= 0.2
    ), tok AS (
      SELECT t.id, t.toks[u.i] AS tok, u.i AS i,
             (CAST(CONCAT('0x', substr(md5(t.toks[u.i]), 1, 8))
                   AS BIGINT) % 8 = 0) AS bnd
      FROM t, unnest(range(1, len(t.toks) + 1)) u(i)
    ), ck AS (
      SELECT id, i, tok,
             coalesce(sum(CASE WHEN bnd THEN 1 ELSE 0 END)
                      OVER (PARTITION BY id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS chunk_no
      FROM tok
    ), chunks AS (
      SELECT id, chunk_no, md5(string_agg(tok, ' ' ORDER BY i)) AS h
      FROM ck GROUP BY id, chunk_no
    ), d AS (SELECT DISTINCT id, h FROM chunks),
    f AS (SELECT h, count(*) AS n, min(id) AS anchor FROM d GROUP BY h),
    cdcp AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM d a JOIN d b ON a.h = b.h AND a.id < b.id
      JOIN f ON f.h = a.h
      WHERE f.n <= 50 OR a.id = f.anchor
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), planted AS (
      SELECT doc_id AS id_a, doc_id + 100000 AS id_b
      FROM documents WHERE doc_id < 50
    )
    SELECT count(*)::BIGINT AS n_planted,
           sum(CASE WHEN j.id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS jaccard_found,
           sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS cdc_found,
           sum(CASE WHEN j.id_a IS NOT NULL OR c.id_a IS NOT NULL
               THEN 1 ELSE 0 END)::BIGINT AS union_found,
           round(sum(CASE WHEN j.id_a IS NOT NULL OR c.id_a IS NOT NULL
                     THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
             AS union_recall
    FROM planted p
    LEFT JOIN jacc j ON j.id_a = p.id_a AND j.id_b = p.id_b
    LEFT JOIN cdcp c ON c.id_a = p.id_a AND c.id_b = p.id_b"""
    return aug


@query("x2_detector_recall", _detector_recall_sql())
def x2_detector_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — detector recall certificate (round 8): plant
    insert-shifted copies of 50 documents (a fixed prefix prepended —
    the adversarial case fixed-window shingles handle worst), run
    BOTH near-dup detectors over the augmented corpus, and report how
    many planted pairs each recovers — measured recall on
    ground-truth duplicates, per detector and for the union, inside
    the engine itself (the number the multi-signal closure's
    provenance hints at, made exact). Both kernels keep their
    production shapes; the planted frame is a deterministic transform
    of the corpus, so the whole experiment carries a full oracle."""
    from vectordb_migrator_spark.operators.dedup import (
        cdc_chunks,
        cdc_pair_candidates,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted_src = docs.filter(F.col("doc_id") < 50)
    aug = docs.unionAll(
        planted_src.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(
                F.lit(
                    "planted prefix sentence for recall measurement "
                ),
                F.col("text"),
            ).alias("text"),
        )
    ).localCheckpoint(eager=True)
    jac = ngram_jaccard_pairs(aug, n=3, threshold=0.2).select(
        "id_a", "id_b", F.lit(1).alias("__j")
    )
    cdc = cdc_pair_candidates(
        cdc_chunks(aug, avg_tokens=8), min_shared=2, max_bucket=50
    ).select("id_a", "id_b", F.lit(1).alias("__c"))
    planted = planted_src.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 100000).alias("id_b"),
    )
    j = planted.join(jac, ["id_a", "id_b"], "left").join(
        cdc, ["id_a", "id_b"], "left"
    )
    found_j = F.col("__j").isNotNull().cast("long")
    found_c = F.col("__c").isNotNull().cast("long")
    found_u = (
        F.col("__j").isNotNull() | F.col("__c").isNotNull()
    ).cast("long")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_planted"),
        F.sum(found_j).cast("long").alias("jaccard_found"),
        F.sum(found_c).cast("long").alias("cdc_found"),
        F.sum(found_u).cast("long").alias("union_found"),
        F.round(
            F.sum(found_u) / F.count(F.lit(1)).cast("double"), 6
        ).alias("union_recall"),
    )


def _metric_agreement_sql() -> str:
    return """
    WITH p AS (SELECT {probe} AS pv),
    q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cos AS (
      SELECT vec_id FROM q, p
      ORDER BY round(list_dot_product(v, pv) /
                 (sqrt(list_dot_product(v, v)) *
                  sqrt(list_dot_product(pv, pv))), 6) DESC, vec_id
      LIMIT 10
    ),
    dot AS (
      SELECT vec_id FROM q, p
      ORDER BY round(list_dot_product(v, pv), 6) DESC, vec_id
      LIMIT 10
    )
    SELECT 10::BIGINT AS k,
           (SELECT count(*) FROM cos JOIN dot USING (vec_id))::BIGINT
             AS overlap,
           round((SELECT count(*) FROM cos JOIN dot USING (vec_id))
                 / 10.0, 6) AS agreement,
           (SELECT count(*) FROM cos JOIN dot USING (vec_id)) = 10
             AS metrics_interchangeable
    """


@query("x4_metric_agreement", None)  # oracle bound below (needs probe)
def x4_metric_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — dot-vs-cosine agreement (round 8): overlap of the top-10
    under raw dot product and under cosine for the standard probe —
    the empirical answer to "can serving skip the norm division"
    (identical on normalized corpora, divergent when norms vary; read
    next to ``x9_norm_profile``, which predicts this from the norm
    CV). Two narrow scans + TakeOrdered(10) each; the agreement join
    is 10-row-sized. Full oracle."""
    from vectordb_migrator_spark.operators.similarity import (
        cosine_topk,
        probe_literal,
    )
    from vectordb_migrator_spark.operators.util import fan_out
    from vectordb_migrator_spark.suite._shared import _probe_vector

    probe = _probe_vector(spark, sf_dir)
    e = fan_out(_t(spark, sf_dir, "embeddings"))
    cos = cosine_topk(e, probe, k=10).select("vec_id")
    p = probe_literal(probe)
    dot = (
        e.select(
            "vec_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding").cast("array<double>"),
                        p,
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda s, x: s + x,
                ),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    ov = cos.join(dot, "vec_id").agg(
        F.lit(10).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("overlap"),
        F.round(F.count(F.lit(1)) / F.lit(10.0), 6).alias("agreement"),
        (F.count(F.lit(1)) == 10).alias("metrics_interchangeable"),
    )
    return ov


def _bind_metric_agreement_oracle() -> None:
    from vectordb_migrator_spark.suite._shared import _PROBE_SQL, ORACLES

    ORACLES["x4_metric_agreement"] = _metric_agreement_sql().format(
        probe=_PROBE_SQL
    )


_bind_metric_agreement_oracle()
