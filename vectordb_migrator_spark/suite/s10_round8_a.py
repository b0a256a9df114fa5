"""Registry family ``s10_round8_a`` — round-8 queries (first half:
tokenizer apply, connectors, experiments, multimodal, graph, CDC)."""

from __future__ import annotations

# ruff: noqa: E501
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.dedup import ngram_jaccard_pairs
from vectordb_migrator_spark.suite._shared import _t, query
from vectordb_migrator_spark.suite.s05_text import _bpe_ctes


def _bpe_segment_arrow_sql(n_merges: int = 8) -> str:
    """Oracle for x0_bpe_segment_arrow: the final ``vocab{n}`` maps
    each word to its SYMBOLS (not just their count), so the segmented
    stream of a document is the position-ordered concatenation of its
    words' symbol lists — md5 over a unit-separator join checks every
    token identity and position, not just counts."""
    n = n_merges
    return (
        _bpe_ctes(n)
        + f""", wsyms AS MATERIALIZED (
      SELECT wid AS word, syms FROM vocab{n}
    ), docw AS (
      SELECT d.doc_id, d.toks[i] AS word, i AS pos
      FROM (SELECT doc_id,
                   list_filter(
                     string_split_regex(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS toks
            FROM documents) d,
           unnest(range(1, len(d.toks) + 1)) u(i)
    ), flat AS (
      SELECT w.doc_id,
             string_agg(array_to_string(m.syms, chr(31)), chr(31)
                        ORDER BY w.pos) AS stream,
             sum(len(m.syms))::BIGINT AS n_tokens
      FROM docw w JOIN wsyms m USING (word)
      GROUP BY w.doc_id
    ), dtok AS (
      SELECT w.doc_id, count(DISTINCT t.s)::BIGINT AS n_distinct
      FROM docw w JOIN wsyms m USING (word), unnest(m.syms) t(s)
      GROUP BY w.doc_id
    )
    SELECT d.doc_id,
           coalesce(f.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(k.n_distinct, 0)::BIGINT AS n_distinct,
           md5(coalesce(f.stream, '')) AS tok_md5
    FROM documents d
    LEFT JOIN flat f USING (doc_id)
    LEFT JOIN dtok k USING (doc_id)
    ORDER BY d.doc_id"""
    )


@query("x0_bpe_segment_arrow", _bpe_segment_arrow_sql(8))
def x0_bpe_segment_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — the PRODUCTION tokenizer apply path (round 8, r7 verdict
    What's-missing #2): fit the 8-merge BPE table (``bpe_learn``),
    then segment EVERY document through the Arrow-batched kernel
    (``bpe_segment_arrow`` — broadcast rank dict, per-batch distinct-
    word cache, one ``mapInPandas`` boundary) instead of
    ``bpe_segment``'s per-merge codegen folds, which its own docstring
    caps at diagnostic merge counts. The md5 over the unit-separator-
    joined token stream makes the oracle check every token identity
    AND position per document — the strongest apply-correctness gate
    expressible as one scalar column. Per-doc token/distinct counts
    ride along for the economics readout. Zero-word docs emit the
    empty stream on both sides (operators/bpe.py:bpe_segment_arrow)."""
    from vectordb_migrator_spark.operators.bpe import (
        bpe_learn,
        bpe_segment_arrow,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_learn(docs, "text", n_merges=8, min_count=2)
    seg = bpe_segment_arrow(docs.select("doc_id", "text"), merges)
    toks = F.coalesce(
        F.col("bpe_tokens"), F.array().cast("array<string>")
    )
    return seg.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.md5(F.concat_ws("\x1f", toks)).alias("tok_md5"),
    ).orderBy("doc_id")


# --------------------------------------------------------------- connector
# The connector-path bench rows (r7 verdict What's-missing #3): the
# reference's entire raison d'être is migration throughput, so the
# Python-DataSource layer gets timed end-to-end in bench.py's headline
# list, not just 25-point correctness tests. The corpus' vector table
# is small at bench scale (2k rows at sf0.1), so both rows replicate
# it REP× with distinct derived ids — a deterministic transform of the
# testdata (same vectors, same labels) that moves events-table row
# counts through the batching machinery. Both carry full value-hash
# oracles over the same replication expressed in SQL.

REP = 30  # replication factor: sf0.1 -> 60k points through the sink


def _replicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectordb_migrator_spark.operators.dedup import fan_out

    emb = _t(spark, sf_dir, "embeddings")
    # fan_out (r12 opt, guide §2.5 input skew): the single-row-group
    # local parquet scans as ONE partition, so every connector sink
    # downstream ran its whole Python write path in one task. On a
    # real cluster the scan is already wide and this is a no-op; the
    # certify aggregates are partition-count invariant.
    return fan_out(emb).select(
        "vec_id",
        "embedding",
        "label",
        F.explode(F.sequence(F.lit(0), F.lit(REP - 1))).alias("__r"),
    ).select(
        (F.col("vec_id") * REP + F.col("__r")).alias("vec_id"),
        "embedding",
        "label",
    )


@query(
    "c0_migration_throughput",
    f"""
    SELECT count(*)::BIGINT AS rows_written,
           count(DISTINCT e.vec_id * {REP} + t.i)::BIGINT AS ids,
           max(len(e.embedding))::BIGINT AS dim,
           count(DISTINCT e.label)::BIGINT AS labels
    FROM embeddings e, range({REP}) t(i)
    """,
)
def c0_migration_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C0 — one END-TO-END config-driven migration, timed (round 8):
    materialize the replicated vector corpus as a parquet source
    fixture, run the full ``Migrator`` lifecycle over it (extract →
    canonical normalize → Observation-accounted sink write,
    plans/pipeline.py:112-196; reference core/migrator.py:42-111),
    then CERTIFY the sink by reading the written parquet back and
    aggregating — the returned row proves the migrated table has
    every id, the right cardinality, and intact vectors. The fixture
    write is part of the timed work on purpose: it is the same
    DataFrame machinery a real backfill pays."""
    import tempfile

    from vectordb_migrator_spark.plans.pipeline import Migrator

    base = tempfile.mkdtemp(prefix="mig_bench_")
    src_path, out_path = f"{base}/src", f"{base}/out"
    _replicated(spark, sf_dir).write.mode("overwrite").parquet(src_path)
    cfg = {
        "source": {
            "type": "parquet",
            "connection": {},
            "query": {
                "path": src_path,
                "id_column": "vec_id",
                "vector_column": "embedding",
                "metadata_columns": ["label"],
            },
        },
        "target": {
            "type": "parquet",
            "connection": {},
            "load": {"path": out_path, "recreate_table": True},
        },
    }
    if not Migrator(spark, cfg).migrate():
        raise RuntimeError("migration reported failure")
    got = spark.read.parquet(out_path)
    return got.agg(
        F.count(F.lit(1)).cast("long").alias("rows_written"),
        F.countDistinct("id").cast("long").alias("ids"),
        F.max(F.size("vector")).cast("long").alias("dim"),
        F.countDistinct(F.col("metadata").getItem("label"))
        .cast("long")
        .alias("labels"),
    )


@query(
    "c2_qdrant_roundtrip_scale",
    f"""
    SELECT count(*)::BIGINT AS points,
           count(DISTINCT e.vec_id * {REP} + t.i)::BIGINT AS ids,
           sum(e.label)::BIGINT AS label_sum,
           max(len(e.embedding))::BIGINT AS dim
    FROM embeddings e, range({REP}) t(i)
    """,
)
def c2_qdrant_roundtrip_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/K2 — the native ``format("qdrant")`` connector round trip
    at bench row counts (round 8): canonical frame → batched upsert
    through the Python DataSource sink (collection DDL on the driver,
    per-partition batch flushes, sources/pyds.py:447) into the
    package's file-backed demo backend, then a partition-planned scan
    back (driver cursor-segmentation pre-pass + parallel segment
    reads, sources/pyds.py:228-248) and an aggregate that certifies
    every point survived with id, payload, and vector intact. This is
    the throughput row for the 1,378-line connector layer — the same
    call surface the reference's mocked-client adapter tests exercise
    (tests/test_qdrant_adapter.py), at 30× their row counts per sf.
    The label payload rides as a string and is summed after cast, so
    the oracle checks payload VALUES, not just counts.

    Self-contained: registers the package's Python DataSources on
    the session it is handed (idempotent), so the query also runs in
    a plain SparkSession that never went through ``session.get_spark``
    (the round-8 driver-harness failure mode)."""
    import tempfile

    from ..sources.pyds import register_data_sources

    register_data_sources(spark)
    store = tempfile.mkdtemp(prefix="demo_qdrant_")
    factory = (
        "vectordb_migrator_spark.sources.demo_backend:qdrant_demo_factory"
    )
    emb = _t(spark, sf_dir, "embeddings")
    dim = int(emb.select(F.size("embedding").alias("d")).first()["d"])
    rep = _replicated(spark, sf_dir)
    canon = rep.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vector"),
        F.create_map(
            F.lit("label"), F.col("label").cast("string")
        ).alias("metadata"),
    )
    (
        canon.write.format("qdrant")
        .mode("append")
        .option("client_factory", factory)
        .option("store_dir", store)
        .option("collection_name", "bench")
        .option("vector_dimension", str(dim))
        .option("batch_size", "1000")
        .save()
    )
    back = (
        spark.read.format("qdrant")
        .option("client_factory", factory)
        .option("store_dir", store)
        .option("collection_name", "bench")
        .option("num_partitions", "16")
        .option("batch_size", "2000")
        .load()
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("points"),
        F.countDistinct("id").cast("long").alias("ids"),
        F.sum(F.col("metadata").getItem("label").cast("long"))
        .cast("long")
        .alias("label_sum"),
        F.max(F.size("vector")).cast("long").alias("dim"),
    )


# ----------------------------------------------------------- experiments
@query(
    "x7_srm_check",
    r"""
    WITH u AS (
      SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS v,
             user_id
      FROM events WHERE user_id IS NOT NULL
    ), c AS (
      SELECT day,
             (count(*) FILTER (WHERE v = 'a'))::BIGINT AS n_a,
             (count(*) FILTER (WHERE v = 'b'))::BIGINT AS n_b
      FROM u GROUP BY day
    )
    SELECT day, n_a, n_b, (n_a + n_b)::BIGINT AS n_total,
           round((n_a - (n_a + n_b) * 0.5) * (n_a - (n_a + n_b) * 0.5)
                   / ((n_a + n_b) * 0.5)
                 + (n_b - (n_a + n_b) * 0.5) * (n_b - (n_a + n_b) * 0.5)
                   / ((n_a + n_b) * 0.5), 6) AS chi2,
           round((n_a - (n_a + n_b) * 0.5) * (n_a - (n_a + n_b) * 0.5)
                   / ((n_a + n_b) * 0.5)
                 + (n_b - (n_a + n_b) * 0.5) * (n_b - (n_a + n_b) * 0.5)
                   / ((n_a + n_b) * 0.5), 6) > 3.841459 AS srm
    FROM c ORDER BY day
    """,
)
def x7_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — daily sample-ratio-mismatch monitor (round 8): the gate
    every experiment readout passes FIRST — chi-square of the
    distinct-user split across the deterministic 50/50 assignment
    (user_id parity), per day. An SRM day means broken randomization
    (bot filtering, redirect loss, logging bias) and invalidates
    every metric computed on it — Fabijan et al. (KDD'19) rank it
    the most common A/B pipeline bug. One spill-safe distinct on
    (day, variant, user), then codegen arithmetic on the day-sized
    frame; full oracle (operators/scale.py:srm_check)."""
    from vectordb_migrator_spark.operators.scale import srm_check

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    d = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("v"),
        "user_id",
    )
    return srm_check(
        d,
        unit_col="user_id",
        variant_col="v",
        expected=[("a", 0.5), ("b", 0.5)],
        group_cols=["day"],
    )


@query(
    "x7_diff_in_diff",
    """
    WITH m AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid
               FROM events),
    b AS (
      SELECT (user_id % 2 = 1) AS t, (epoch(ts) > m.mid) AS p,
             value::DECIMAL(28,10) AS yd,
             (value * value)::DECIMAL(38,10) AS y2
      FROM events, m WHERE value IS NOT NULL AND user_id IS NOT NULL
    ), cells AS (
      SELECT
        (count(*) FILTER (WHERE NOT t AND NOT p))::BIGINT AS n_pre_c,
        (count(*) FILTER (WHERE NOT t AND p))::BIGINT AS n_post_c,
        (count(*) FILTER (WHERE t AND NOT p))::BIGINT AS n_pre_t,
        (count(*) FILTER (WHERE t AND p))::BIGINT AS n_post_t,
        (sum(yd) FILTER (WHERE NOT t AND NOT p))::DOUBLE AS s_pre_c,
        (sum(yd) FILTER (WHERE NOT t AND p))::DOUBLE AS s_post_c,
        (sum(yd) FILTER (WHERE t AND NOT p))::DOUBLE AS s_pre_t,
        (sum(yd) FILTER (WHERE t AND p))::DOUBLE AS s_post_t,
        (sum(y2) FILTER (WHERE NOT t AND NOT p))::DOUBLE AS q_pre_c,
        (sum(y2) FILTER (WHERE NOT t AND p))::DOUBLE AS q_post_c,
        (sum(y2) FILTER (WHERE t AND NOT p))::DOUBLE AS q_pre_t,
        (sum(y2) FILTER (WHERE t AND p))::DOUBLE AS q_post_t
      FROM b
    ), d AS (
      SELECT *,
        s_pre_c / n_pre_c AS m_pre_c, s_post_c / n_post_c AS m_post_c,
        s_pre_t / n_pre_t AS m_pre_t, s_post_t / n_post_t AS m_post_t
      FROM cells
    ), e AS (
      SELECT *,
        ((q_pre_c - n_pre_c * m_pre_c * m_pre_c) / (n_pre_c - 1)) / n_pre_c
          AS v_pre_c,
        ((q_post_c - n_post_c * m_post_c * m_post_c) / (n_post_c - 1))
          / n_post_c AS v_post_c,
        ((q_pre_t - n_pre_t * m_pre_t * m_pre_t) / (n_pre_t - 1)) / n_pre_t
          AS v_pre_t,
        ((q_post_t - n_post_t * m_post_t * m_post_t) / (n_post_t - 1))
          / n_post_t AS v_post_t,
        (m_post_t - m_pre_t) - (m_post_c - m_pre_c) AS did_raw
      FROM d
    )
    SELECT n_pre_c, n_post_c, n_pre_t, n_post_t,
           round(m_pre_c, 6) AS mean_pre_c,
           round(m_post_c, 6) AS mean_post_c,
           round(m_pre_t, 6) AS mean_pre_t,
           round(m_post_t, 6) AS mean_post_t,
           round(did_raw, 6) AS did,
           round(sqrt(v_pre_c + v_post_c + v_pre_t + v_post_t), 6) AS se,
           round(did_raw / sqrt(v_pre_c + v_post_c + v_pre_t + v_post_t), 6)
             AS z,
           abs(round(did_raw
                     / sqrt(v_pre_c + v_post_c + v_pre_t + v_post_t), 6))
             > 1.96 AS significant
    FROM e
    """,
)
def x7_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — difference-in-differences readout (round 8): the 2×2
    pre/post × treatment/control causal estimate for NON-randomized
    rollouts, next to the randomized-experiment stack (CUPED, SRM,
    Mann-Whitney, power): treatment = user parity, post = the second
    half of the event range (the ``x12_psi_drift`` midpoint
    convention), outcome = event value. Cell sums and squared sums
    fold in exact DECIMAL so the SE is associativity-independent; the
    whole estimator is ONE map-side-combinable aggregate plus
    closed-form arithmetic — no second scan, no shuffle wider than
    the 1-row fold (operators/scale.py:diff_in_diff)."""
    from vectordb_migrator_spark.operators.scale import diff_in_diff

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    mid = ev.agg(
        (
            (
                F.unix_timestamp(F.min("ts"))
                + F.unix_timestamp(F.max("ts"))
            )
            / 2.0
        ).alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid)).select(
        "value",
        (F.col("user_id") % 2 == 1).alias("treat"),
        (F.unix_timestamp("ts").cast("double") > F.col("mid")).alias(
            "post"
        ),
    )
    return diff_in_diff(
        tagged, outcome_col="value", treat_col="treat", post_col="post"
    )


def _f1_sql() -> str:
    from vectordb_migrator_spark.suite.s05_text import _langid_case_sql

    case = _langid_case_sql()
    return f"""
    WITH cm AS (
      SELECT lang AS t, {case} AS p, count(*)::BIGINT AS n
      FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2
    ), labels AS (
      SELECT t AS label FROM cm UNION SELECT p FROM cm
    ), per AS (
      SELECT l.label,
        coalesce((SELECT sum(n) FROM cm WHERE t = l.label), 0)::BIGINT
          AS support,
        coalesce((SELECT sum(n) FROM cm WHERE t = l.label AND p = l.label),
                 0)::BIGINT AS tp,
        (coalesce((SELECT sum(n) FROM cm WHERE p = l.label), 0)
         - coalesce((SELECT sum(n) FROM cm WHERE t = l.label
                       AND p = l.label), 0))::BIGINT AS fp,
        (coalesce((SELECT sum(n) FROM cm WHERE t = l.label), 0)
         - coalesce((SELECT sum(n) FROM cm WHERE t = l.label
                       AND p = l.label), 0))::BIGINT AS fn
      FROM labels l
    ), scored AS (
      SELECT label, support, tp, fp, fn,
             round(tp::DOUBLE / nullif(tp + fp, 0), 6) AS precision,
             round(tp::DOUBLE / nullif(tp + fn, 0), 6) AS recall,
             round(2.0 * (tp::DOUBLE / nullif(tp + fp, 0))
                       * (tp::DOUBLE / nullif(tp + fn, 0))
                   / nullif(tp::DOUBLE / nullif(tp + fp, 0)
                            + tp::DOUBLE / nullif(tp + fn, 0), 0), 6) AS f1
      FROM per
    ), micro AS (
      SELECT '__micro__' AS label,
             sum(support)::BIGINT AS support, sum(tp)::BIGINT AS tp,
             sum(fp)::BIGINT AS fp, sum(fn)::BIGINT AS fn,
             round(sum(tp)::DOUBLE / nullif(sum(tp) + sum(fp), 0), 6)
               AS precision,
             round(sum(tp)::DOUBLE / nullif(sum(tp) + sum(fn), 0), 6)
               AS recall,
             round(2.0 * (sum(tp)::DOUBLE / nullif(sum(tp) + sum(fp), 0))
                       * (sum(tp)::DOUBLE / nullif(sum(tp) + sum(fn), 0))
                   / nullif(sum(tp)::DOUBLE / nullif(sum(tp) + sum(fp), 0)
                            + sum(tp)::DOUBLE / nullif(sum(tp) + sum(fn), 0),
                            0), 6) AS f1
      FROM scored
    ), macro AS (
      SELECT '__macro__' AS label,
             sum(support)::BIGINT AS support,
             NULL::BIGINT AS tp, NULL::BIGINT AS fp, NULL::BIGINT AS fn,
             round(avg(precision), 6) AS precision,
             round(avg(recall), 6) AS recall,
             round(avg(f1), 6) AS f1
      FROM scored
    )
    SELECT * FROM scored
    UNION ALL SELECT * FROM micro
    UNION ALL SELECT * FROM macro
    ORDER BY label
    """


@query("x5_f1_report", _f1_sql())
def x5_f1_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — per-class precision/recall/F1 report card (round 8) for
    the stopword-argmax language classifier against the corpus's
    ground-truth ``lang``: the metric trio every curation classifier
    owes its users, completing the evaluation suite next to
    ``x5_langid_confusion`` (raw cells) and ``x5_classifier_kappa``
    (chance-corrected agreement) — F1 is what you quote, and the
    ``__macro__`` row is the imbalance-honest summary while
    ``__micro__`` equals accuracy. ONE (true, pred) contingency
    aggregate; every metric is arithmetic over the classes²-sized
    frame (operators/classify.py:f1_report)."""
    from vectordb_migrator_spark.functions.text import lang_id
    from vectordb_migrator_spark.operators.classify import f1_report

    d = _t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    scored = d.select("lang", lang_id("text").alias("pred"))
    return f1_report(scored, true_col="lang", pred_col="pred")


def _pk_sql() -> str:
    tables = [
        ("customer", ["c_custkey"]),
        ("documents", ["doc_id"]),
        ("embeddings", ["vec_id"]),
        ("events", ["event_id"]),
        ("lineitem", ["l_orderkey", "l_linenumber"]),
        ("nation", ["n_nationkey"]),
        ("orders", ["o_orderkey"]),
        ("part", ["p_partkey"]),
        ("region", ["r_regionkey"]),
        ("supplier", ["s_suppkey"]),
    ]
    parts = []
    for name, keys in tables:
        null_any = " OR ".join(f"{k} IS NULL" for k in keys)
        key_list = ", ".join(keys)
        parts.append(f"""
    SELECT '{name}' AS tbl,
           coalesce(sum(n), 0)::BIGINT AS n_rows,
           coalesce(sum(CASE WHEN NOT nl THEN 1 END), 0)::BIGINT
             AS distinct_keys,
           coalesce(sum(CASE WHEN NOT nl AND n > 1 THEN 1 END), 0)::BIGINT
             AS dup_keys,
           coalesce(sum(CASE WHEN NOT nl AND n > 1 THEN n - 1 END),
                    0)::BIGINT AS dup_rows,
           coalesce(sum(CASE WHEN nl THEN n END), 0)::BIGINT AS null_rows,
           round(coalesce(sum(CASE WHEN NOT nl AND n > 1 THEN n - 1 END),
                          0)::DOUBLE / nullif(coalesce(sum(n), 0), 0), 6)
             AS dup_rate
    FROM (SELECT {key_list}, ({null_any}) AS nl, count(*)::BIGINT AS n
          FROM {name} GROUP BY ALL)""")
    return (
        "SELECT * FROM (" + " UNION ALL ".join(parts) + ") ORDER BY tbl"
    )


@query("x12_pk_uniqueness", _pk_sql())
def x12_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — primary-key uniqueness audit across all ten warehouse
    tables (round 8): the third integrity leg next to
    ``x12_quality_constraints`` (row rules) and
    ``x12_referential_integrity`` (FK orphans) — per declared key
    (lineitem audits its COMPOSITE (orderkey, linenumber) key), rows,
    distinct keys, duplicated keys, the surplus rows they contribute,
    NULL-key rows, and the dup rate. Release pipelines assert
    ``dup_keys == 0`` before publishing; a nonzero row names exactly
    which ingest double-applied. One (key, count) fold per table —
    map-side combinable, spill-safe — then one-row stats, unioned
    (operators/validation.py:pk_uniqueness)."""
    from vectordb_migrator_spark.operators.validation import pk_uniqueness

    spec = [
        ("customer", ["c_custkey"]),
        ("documents", ["doc_id"]),
        ("embeddings", ["vec_id"]),
        ("events", ["event_id"]),
        ("lineitem", ["l_orderkey", "l_linenumber"]),
        ("nation", ["n_nationkey"]),
        ("orders", ["o_orderkey"]),
        ("part", ["p_partkey"]),
        ("region", ["r_regionkey"]),
        ("supplier", ["s_suppkey"]),
    ]
    return pk_uniqueness(
        [(name, _t(spark, sf_dir, name), keys) for name, keys in spec]
    )


@query(
    "x7_ece",
    """
    WITH s AS (
      SELECT least(value / 100.0, 1.0) AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL AND value >= 0
    ), binned AS (
      SELECT least(9, greatest(0, ceil(score * 10)::INT - 1))::BIGINT
               AS bin,
             score::DECIMAL(28,10) AS sd, y
      FROM s
    ), per AS (
      SELECT bin, count(*)::BIGINT AS n,
             sum(sd) AS conf_sum, sum(y)::BIGINT AS hits
      FROM binned GROUP BY bin
    ), scored AS (
      SELECT bin, n,
             round(conf_sum::DOUBLE / n, 6) AS conf,
             round(hits::DOUBLE / n, 6) AS acc,
             round(hits::DOUBLE / n - conf_sum::DOUBLE / n, 6) AS gap,
             abs(hits::DOUBLE / n - conf_sum::DOUBLE / n) * n AS w_gap
      FROM per
    )
    SELECT bin, n, conf, acc, gap FROM scored
    UNION ALL
    SELECT -1, NULL, NULL, NULL,
           round(sum(w_gap) / sum(n), 6)
    FROM scored
    ORDER BY bin
    """,
)
def x7_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — expected calibration error of a probability-shaped score
    (round 8): the event value scaled to [0, 1] read as "probability
    this event is a purchase", graded in ten equal-width bins — per
    bin the confidence/accuracy gap, and the ``bin = -1`` summary row
    carries ECE = Σ (n_b/N)·|acc_b − conf_b| (Guo et al., ICML'17),
    the ONE number a pipeline thresholds before trusting any score as
    a sampling weight. Complements ``x5_nb_calibration`` (reliability
    DIAGRAM for the NB classifier): this is the scalar gate, on a
    different scoring surface. One codegen bin projection + one
    map-side-combinable aggregate, DECIMAL confidence sums
    (operators/classify.py:ece_report)."""
    from vectordb_migrator_spark.operators.classify import ece_report

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    s = ev.select(
        F.least(F.col("value") / 100.0, F.lit(1.0)).alias("score"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    return ece_report(s, score_col="score", label_col="y", n_bins=10)


# ------------------------------------------------------------- multimodal
@query(
    "x6_png_decode",
    """
    SELECT doc_id,
           (6 + (doc_id % 6) * 3)::INT AS width,
           (4 + (doc_id % 4) * 2)::INT AS height,
           (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)::INT
             AS channels,
           ((6 + (doc_id % 6) * 3) * (4 + (doc_id % 4) * 2))::BIGINT
             AS n_pixels,
           (CASE doc_id % 3
              WHEN 0 THEN ((6 + (doc_id % 6) * 3) - 1) / 2.0
                          + ((4 + (doc_id % 4) * 2) - 1) / 2.0
              WHEN 1 THEN (doc_id % 200)::DOUBLE
              ELSE ((6 + (doc_id % 6) * 3) - 1) / 2.0 END)::DOUBLE
             AS mean_r,
           (CASE doc_id % 3
              WHEN 0 THEN ((6 + (doc_id % 6) * 3) - 1) / 2.0
                          + ((4 + (doc_id % 4) * 2) - 1) / 2.0
              WHEN 1 THEN ((6 + (doc_id % 6) * 3) - 1) / 2.0
              ELSE ((4 + (doc_id % 4) * 2) - 1) / 2.0 END)::DOUBLE
             AS mean_g,
           (CASE doc_id % 3
              WHEN 0 THEN ((6 + (doc_id % 6) * 3) - 1) / 2.0
                          + ((4 + (doc_id % 4) * 2) - 1) / 2.0
              WHEN 1 THEN ((4 + (doc_id % 4) * 2) - 1) / 2.0
              ELSE (doc_id % 200)::DOUBLE END)::DOUBLE AS mean_b,
           (CASE doc_id % 3 WHEN 1 THEN doc_id % 200 ELSE 0 END)::INT
             AS px00_r,
           0::INT AS px00_g,
           (CASE doc_id % 3 WHEN 2 THEN doc_id % 200 ELSE 0 END)::INT
             AS px00_b
    FROM documents ORDER BY doc_id
    """,
)
def x6_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — REAL compressed-image decode (round 8): PNG's only codec
    is stdlib zlib, so the full pipeline — chunk walk, IDAT inflate,
    the five-filter unfilter (None/Sub/Up/Average/Paeth), pixel
    stats — runs on actual compressed bytes end to end, completing
    the decode-tier ladder above BMP (uncompressed) and the header
    triage (no decode). Fixtures plant per-doc gradients across
    gray/RGB/RGBA color types with the row filter CYCLING through
    all five per image, so one wrong unfilter path shifts the
    closed-form means and the top-left pixel the oracle pins. The
    encoder itself is spec-pinned in tests/test_multimodal.py against
    RFC 2083's difference formulas, breaking encoder/decoder
    shared-bug symmetry
    (operators/multimodal.py:png_decode_features)."""
    from vectordb_migrator_spark.operators.multimodal import (
        PNG_SCHEMA,
        fused_fixture_features,
        png_feature_row,
    )

    def make_payload(d: int) -> bytes:
        import numpy as np

        from vectordb_migrator_spark.operators.multimodal import png_encode

        w = 6 + (d % 6) * 3
        h = 4 + (d % 4) * 2
        amp = d % 200
        kind = d % 3
        if kind == 0:  # gray: v = x + y
            px = (
                np.arange(w)[None, :] + np.arange(h)[:, None]
            ).astype(np.uint8)
            ct = 0
        elif kind == 1:  # RGB: r const, g = x, b = y
            px = np.zeros((h, w, 3), dtype=np.uint8)
            px[:, :, 0] = amp
            px[:, :, 1] = np.arange(w)[None, :]
            px[:, :, 2] = np.arange(h)[:, None]
            ct = 2
        else:  # RGBA: r = x, g = y, b const, a = 255
            px = np.zeros((h, w, 4), dtype=np.uint8)
            px[:, :, 0] = np.arange(w)[None, :]
            px[:, :, 1] = np.arange(h)[:, None]
            px[:, :, 2] = amp
            px[:, :, 3] = 255
            ct = 6
        return png_encode(px, color_type=ct, row_filters=[0, 1, 2, 3, 4])

    # fan_out (r12 opt): the single-row-group scan otherwise runs the
    # whole encode+decode pipeline in ONE task; per-image work is
    # embarrassingly parallel
    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        make_payload,
        png_feature_row,
        PNG_SCHEMA,
    ).orderBy("doc_id")


# ------------------------------------------------------------------ graph
# The shared near-dup pair kernel's SQL replica (the same CTE text the
# round-7 triangle/kcore/coefficient oracles inline): 3-gram shingles,
# Jaccard >= 0.2, id_a < id_b.
_NGRAM_PAIRS_CTE = r"""
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
      UNION SELECT id_b, id_a FROM pairs
    )"""


def _lpa_sql(n_iter: int = 3) -> str:
    sql = _NGRAM_PAIRS_CTE + """, lab0 AS MATERIALIZED (
      SELECT DISTINCT u AS id, u AS lab FROM e
    )"""
    for k in range(1, n_iter + 1):
        sql += f""", m{k} AS (
      SELECT e.u AS id, l.lab FROM e JOIN lab{k - 1} l ON l.id = e.v
    ), c{k} AS (
      SELECT id, lab, count(*)::BIGINT AS n FROM m{k} GROUP BY id, lab
    ), lab{k} AS MATERIALIZED (
      SELECT id, lab FROM (
        SELECT id, lab,
               row_number() OVER (PARTITION BY id
                                  ORDER BY n DESC, lab) AS rn
        FROM c{k}) WHERE rn = 1
    )"""
    return sql + f"""
    SELECT lab::BIGINT AS community, count(*)::BIGINT AS size,
           min(id)::BIGINT AS min_id, max(id)::BIGINT AS max_id
    FROM lab{n_iter} GROUP BY lab ORDER BY community"""


@query("x2_label_propagation", _lpa_sql(3))
def x2_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — synchronous label-propagation communities (round 8) on
    the SAME near-dup pair graph as the triangle/k-core/coefficient
    family: where connected components answer "reachable at all?",
    LPA's neighbor-label majority splits a weakly-bridged component
    into its dense cores after 3 deterministic rounds (smallest-label
    tie-break, synchronous update — a pure function of the graph, so
    the unrolled per-iteration SQL oracle replays it exactly, the
    PageRank-oracle pattern). Per round: one neighbor-label shuffle +
    one count + one per-vertex top-1 window — all bounded state
    (operators/graph.py:label_propagation)."""
    from vectordb_migrator_spark.operators.graph import label_propagation

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2
    ).localCheckpoint(eager=True)
    lp = label_propagation(pairs, n_iter=3)
    return (
        lp.groupBy(F.col("label").cast("long").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("size"),
            F.min("id").cast("long").alias("min_id"),
            F.max("id").cast("long").alias("max_id"),
        )
        .orderBy("community")
    )


@query(
    "x2_adamic_adar",
    """
    WITH bi AS (
      SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
    ), cp AS MATERIALIZED (
      SELECT a.it AS id_a, b.it AS id_b
      FROM bi a JOIN bi b ON a.bk = b.bk AND a.it < b.it
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), e AS (
      SELECT id_a AS u, id_b AS v FROM cp
      UNION SELECT id_b, id_a FROM cp
    ), deg AS (
      SELECT u AS z, count(*)::DOUBLE AS d FROM e GROUP BY u
    ), wed AS (
      SELECT e1.u AS a, e2.u AS b, e1.v AS z
      FROM e e1 JOIN e e2 ON e1.v = e2.v AND e1.u < e2.u
    ), sc AS (
      SELECT a, b, count(*)::BIGINT AS common,
             round(sum(round(1.0 / ln(d.d), 9)::DECIMAL(28,9))::DOUBLE, 6)
               AS score
      FROM wed JOIN deg d ON d.z = wed.z GROUP BY a, b
    )
    SELECT a, b, common, score FROM sc
    WHERE NOT EXISTS (SELECT 1 FROM cp p
                      WHERE p.id_a = sc.a AND p.id_b = sc.b)
    ORDER BY score DESC, a, b LIMIT 50
    """,
)
def x2_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — Adamic–Adar link prediction on the part co-purchase
    graph (round 8): items sharing >= 2 orders are edges; for part
    pairs NOT linked, score = Σ 1/ln(deg) over common co-purchase
    partners — rare shared partners vouch harder than hubs — the
    related-items queue the support threshold missed. (The near-dup
    doc graph is the WRONG input here: Jaccard >= t is transitively
    closed on this corpus, so it has no open wedges — link prediction
    needs a co-occurrence graph, where open triangles are the norm.)
    Co-purchase edges come from the in-basket pair kernel (one
    groupBy-orderkey shuffle, fan-out bounded by order size squared,
    never a lineitem self-join); then the wedge join off the degree
    table (the triangle counter's shape), one anti-join against
    existing edges, per-term round(9) + DECIMAL sums so the score is
    associativity-independent, TakeOrdered(50)
    (operators/graph.py:adamic_adar, co_occurrence_edges)."""
    from vectordb_migrator_spark.operators.graph import (
        adamic_adar,
        co_occurrence_edges,
    )

    edges = co_occurrence_edges(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_support=2,
    ).localCheckpoint(eager=True)
    return adamic_adar(edges, k=50)


# ------------------------------------------------------------ matryoshka
def _matryoshka_sql() -> str:
    """Oracle for x4_matryoshka_recall: per prefix length d, recall@10
    of cosine over the FIRST d dims against the full-width truth.
    (Renormalization is a no-op for cosine ranking, so plain prefix
    slices are the whole mechanism.)"""
    parts = []
    for d in (8, 16, 32, 64):
        parts.append(f"""
    SELECT {d}::BIGINT AS dim, 10::BIGINT AS k,
           count(*)::BIGINT AS n_hits,
           round(count(*) / 10.0, 6) AS recall
    FROM truth JOIN (
      SELECT vec_id FROM q, p
      ORDER BY round(list_dot_product(v[1:{d}], pv[1:{d}]) /
                 (sqrt(list_dot_product(v[1:{d}], v[1:{d}])) *
                  sqrt(list_dot_product(pv[1:{d}], pv[1:{d}]))), 6)
               DESC, vec_id
      LIMIT 10) a USING (vec_id)""")
    return (
        """
    WITH p AS (SELECT {probe} AS pv),
    q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    truth AS (
      SELECT vec_id FROM q, p
      ORDER BY round(list_dot_product(v, pv) /
                 (sqrt(list_dot_product(v, v)) *
                  sqrt(list_dot_product(pv, pv))), 6) DESC, vec_id
      LIMIT 10)
    """
        + " UNION ALL ".join(parts)
        + " ORDER BY dim"
    )


@query("x4_matryoshka_recall", None)  # oracle bound below (needs probe)
def x4_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — Matryoshka (MRL, Kusupati et al. 2022) truncation recall
    gate (round 8): recall@10 of brute-force cosine over PREFIX dims
    d ∈ {8,16,32,64} against the full-width truth — the measurement
    that licenses serving a 64-dim corpus from its first 16 dims (4×
    less scan bandwidth and index footprint; at 100 TB the prefix IS
    the hot tier, the tail dims a rerank fetch). Cosine ranking is
    renormalization-invariant, so truncation is a pure ``F.slice`` —
    every per-dim ranking stays a narrow scan +
    TakeOrderedAndProject(k), no vector shuffle, and the recall joins
    are k-row-sized. Full oracle, d=64 row doubling as the
    self-check anchor (recall 1.0 by construction)
    (operators/similarity.py:cosine_topk)."""
    from vectordb_migrator_spark.operators.similarity import cosine_topk
    from vectordb_migrator_spark.operators.util import fan_out
    from vectordb_migrator_spark.suite._shared import _probe_vector

    probe = _probe_vector(spark, sf_dir)
    e = fan_out(_t(spark, sf_dir, "embeddings"))
    truth = cosine_topk(e, probe, k=10).select("vec_id")
    out = None
    for d in (8, 16, 32, 64):
        sliced = e.select(
            "vec_id", F.slice(F.col("embedding"), 1, d).alias("embedding")
        )
        appr = cosine_topk(sliced, probe[:d], k=10).select("vec_id")
        row = truth.join(appr, "vec_id").agg(
            F.lit(d).cast("long").alias("dim"),
            F.lit(10).cast("long").alias("k"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.round(F.count(F.lit(1)) / F.lit(10.0), 6).alias("recall"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("dim")


def _bind_matryoshka_oracle() -> None:
    from vectordb_migrator_spark.suite._shared import _PROBE_SQL, ORACLES

    ORACLES["x4_matryoshka_recall"] = _matryoshka_sql().format(
        probe=_PROBE_SQL
    )


_bind_matryoshka_oracle()


def _ppr_sql(n_iter: int = 10, d: float = 0.85, n_seeds: int = 5) -> str:
    """Oracle for x2_personalized_pagerank: the shared pair-graph CTE,
    a deterministic seed set (the n_seeds smallest vertex ids), then
    ``n_iter`` unrolled random-walk-with-restart iterations under the
    engine-exactness contract (DECIMAL(28,18) sums, round-12/iter)."""
    base = f"{1.0 - d} / {n_seeds}"
    sql = _NGRAM_PAIRS_CTE + f""", verts AS (
      SELECT DISTINCT u AS id FROM e
    ), deg AS (
      SELECT u AS id, count(*)::BIGINT AS deg FROM e GROUP BY u
    ), seeds AS MATERIALIZED (
      SELECT id FROM verts ORDER BY id LIMIT {n_seeds}
    ), r0 AS (
      SELECT v.id,
             CASE WHEN s.id IS NOT NULL
                  THEN 1.0 / {n_seeds} ELSE 0.0 END AS rank
      FROM verts v LEFT JOIN seeds s USING (id)
    )"""
    for k in range(1, n_iter + 1):
        sql += f""", r{k} AS (
      SELECT v.id,
             round(CASE WHEN s.id IS NOT NULL THEN {base} ELSE 0.0 END
                   + {d} * coalesce(c.s, 0.0), 12) AS rank
      FROM verts v LEFT JOIN seeds s USING (id)
      LEFT JOIN (
        SELECT e.v AS id,
               sum((r.rank / dg.deg)::DECIMAL(28,18))::DOUBLE AS s
        FROM e JOIN r{k - 1} r ON e.u = r.id
        JOIN deg dg ON dg.id = e.u
        GROUP BY e.v) c USING (id)
    )"""
    return (
        sql
        + f"""
    SELECT v.id, round(r.rank, 6) AS rank,
           (CASE WHEN s.id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS is_seed
    FROM verts v
    JOIN r{n_iter} r ON r.id = v.id
    LEFT JOIN seeds s ON s.id = v.id
    ORDER BY v.id"""
    )


@query("x2_personalized_pagerank", _ppr_sql())
def x2_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — personalized PageRank / random walk with restart
    (round 8) on the near-dup pair graph: the teleport term
    concentrates on a seed set (here the 5 smallest vertex ids,
    standing in for a known-bad document list — benchmark
    contamination, spam, a takedown), so ranks measure PROXIMITY TO
    THE SEEDS, not global importance: the expansion queue for "what
    else is structurally tied to the documents we already know are
    bad". Seeds ride as an ``isin`` literal (model-sized — never a
    join); same per-iteration (long, double) loop and DECIMAL
    round-12 exactness contract as global PageRank, so the unrolled
    SQL oracle replays all 10 iterations exactly
    (operators/graph.py:pagerank seeds=)."""
    from vectordb_migrator_spark.operators.graph import pagerank

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2
    ).localCheckpoint(eager=True)
    verts = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # query parameter, not data movement: n_seeds rows
    seed_ids = [r["id"] for r in verts.orderBy("id").limit(5).collect()]
    pr = pagerank(pairs, seeds=seed_ids)
    return pr.select(
        "id",
        F.round("rank", 6).alias("rank"),
        F.col("id").isin(seed_ids).cast("long").alias("is_seed"),
    ).orderBy("id")


# ----------------------------------------------------------------- CDC
_CDC_CHUNKS_CTE = r"""
    WITH t AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), tok AS (
      SELECT t.id, t.toks[u.i] AS tok, u.i AS i,
             (CAST(CONCAT('0x', substr(md5(t.toks[u.i]), 1, 8)) AS BIGINT)
              % 8 = 0) AS bnd
      FROM t, unnest(range(1, len(t.toks) + 1)) u(i)
    ), ck AS (
      SELECT id, i, tok,
             coalesce(sum(CASE WHEN bnd THEN 1 ELSE 0 END)
                      OVER (PARTITION BY id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS chunk_no
      FROM tok
    ), chunks AS (
      SELECT id, chunk_no::BIGINT AS chunk_no,
             md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5
      FROM ck GROUP BY id, chunk_no
    )"""


@query(
    "x2_cdc_chunks",
    _CDC_CHUNKS_CTE
    + """
    SELECT id, chunk_no, chunk_md5 FROM chunks ORDER BY id, chunk_no""",
)
def x2_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — content-defined chunking of the corpus (round 8): token
    boundaries where the md5 hash ≡ 0 (mod 8), so chunk frames are a
    function of content alone — an inserted sentence re-chunks one
    chunk instead of shifting every downstream window (the
    rsync/LBFS/gear-hash idea on word streams). The full (id,
    chunk_no, chunk_md5) table is oracle-checked, which pins every
    boundary decision and every chunk's exact text. The chunker is
    ONE linear codegen fold over the token array — no explode, no
    per-doc window, no shuffle (operators/dedup.py:cdc_chunks)."""
    from vectordb_migrator_spark.operators.dedup import cdc_chunks

    return (
        cdc_chunks(_t(spark, sf_dir, "documents"), avg_tokens=8)
        .select("id", "chunk_no", "chunk_md5")
        .orderBy("id", "chunk_no")
    )


@query(
    "x2_cdc_pairs",
    _CDC_CHUNKS_CTE
    + """
    , d AS (SELECT DISTINCT id, chunk_md5 FROM chunks),
    f AS (SELECT chunk_md5, count(*) AS n, min(id) AS anchor
          FROM d GROUP BY 1)
    SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS shared
    FROM d a JOIN d b ON a.chunk_md5 = b.chunk_md5 AND a.id < b.id
    JOIN f ON f.chunk_md5 = a.chunk_md5
    WHERE f.n <= 50 OR a.id = f.anchor
    GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY id_a, id_b""",
)
def x2_cdc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — shift-robust near-dup candidates via shared CDC chunks
    (round 8): documents sharing >= 2 content-defined chunk hashes.
    This is the dedup family's answer to INSERT-SHIFTED duplicates —
    a paragraph prepended to a copy leaves every fixed shingle window
    displaced (n-gram Jaccard decays) but only ONE chunk differs, so
    chunk-equality still links the pair at exact-hash-join cost. Same
    blocked-join scale shape as the LSH families: equi-join on
    chunk_md5 with the min-id star cap on hub chunks (boilerplate
    shared by thousands must not go quadratic), min_shared as the
    precision dial (operators/dedup.py:cdc_pair_candidates)."""
    from vectordb_migrator_spark.operators.dedup import (
        cdc_chunks,
        cdc_pair_candidates,
    )

    chunks = cdc_chunks(_t(spark, sf_dir, "documents"), avg_tokens=8)
    return cdc_pair_candidates(
        chunks, min_shared=2, max_bucket=50
    ).orderBy("id_a", "id_b")


def _sprt_sql(p0: float = 0.18, p1: float = 0.22) -> str:
    """Oracle for x7_sprt: the same inlined log-weight/boundary
    literals the operator computes (round-12 weights, round-6
    boundaries), so both engines multiply identical doubles."""
    import math

    w1 = round(math.log(p1 / p0), 12)
    w0 = round(math.log((1.0 - p1) / (1.0 - p0)), 12)
    ub = round(math.log(0.95 / 0.05), 6)
    lb = round(math.log(0.05 / 0.95), 6)
    return f"""
    WITH tr AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS variant,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS period,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
      FROM events WHERE user_id IS NOT NULL
    ), d AS (
      SELECT variant, period, count(*)::BIGINT AS n_p, sum(s)::BIGINT AS k_p
      FROM tr GROUP BY 1, 2
    ), c AS (
      SELECT variant, period,
             (sum(n_p) OVER w)::BIGINT AS n,
             (sum(k_p) OVER w)::BIGINT AS k
      FROM d WINDOW w AS (PARTITION BY variant ORDER BY period
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), l AS (
      SELECT variant, period, n, k,
             round(k * {w1}::DOUBLE + (n - k) * {w0}::DOUBLE, 6) AS llr
      FROM c
    ), dec AS (
      SELECT *, CASE WHEN llr >= {ub} THEN 'accept_h1'
                     WHEN llr <= {lb} THEN 'accept_h0'
                     ELSE 'continue' END AS decision
      FROM l
    )
    SELECT variant, period, n, k, llr, decision,
           max(CASE WHEN decision <> 'continue' THEN 1 ELSE 0 END)
             OVER (PARTITION BY variant ORDER BY period
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
             AS stopped
    FROM dec ORDER BY variant, period"""


@query("x7_sprt", _sprt_sql())
def x7_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — Wald SPRT early-stopping trace (round 8), completing the
    experimentation battery (SRM gate → CUPED variance cut → this —
    the always-valid 'can we stop the test today?' readout a
    fixed-horizon t-test forbids peeking at): per variant and day,
    cumulative purchase-rate trials against H0 p=0.18 vs H1 p=0.22
    at alpha=beta=0.05, with the boundary decision and the sticky
    `stopped` flag (post-crossing rows are moot by Wald's argument).
    Log-weights and boundaries are inlined Python-rounded literals,
    so Spark and DuckDB multiply identical doubles. The trial stream
    collapses to a (variant, day) frame before any window touches it
    (operators/scale.py:sprt_trace)."""
    from vectordb_migrator_spark.operators.scale import sprt_trace

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    trials = ev.select(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("variant"),
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "period"
        ),
        (F.col("event_type") == "purchase").cast("int").alias("s"),
    )
    return sprt_trace(
        trials,
        period_col="period",
        variant_col="variant",
        success_col="s",
        p0=0.18,
        p1=0.22,
    )


@query(
    "x0_fim_transform",
    r"""
    WITH t AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), b AS (
      SELECT id, toks, len(toks)::BIGINT AS n_tok,
             (CAST(CONCAT('0x', substr(md5('fim:' || id), 1, 8)) AS BIGINT)
              % 2 = 0) AS apply,
             CAST(CONCAT('0x', substr(md5('fimu:' || id), 1, 8)) AS BIGINT)
               % (len(toks) + 1) AS c1,
             CAST(CONCAT('0x', substr(md5('fimv:' || id), 1, 8)) AS BIGINT)
               % (len(toks) + 1) AS c2
      FROM t
    ), s AS (
      SELECT id, toks, n_tok, apply,
             least(c1, c2) AS u, greatest(c1, c2) AS v
      FROM b
    )
    SELECT id, (CASE WHEN apply THEN 1 ELSE 0 END)::BIGINT AS fim, n_tok,
           CASE WHEN apply THEN u END::BIGINT AS u,
           CASE WHEN apply THEN v END::BIGINT AS v,
           CASE WHEN apply THEN array_to_string(
                  ['<PRE>'] || toks[1:u] || ['<SUF>']
                  || toks[v+1:n_tok] || ['<MID>'] || toks[u+1:v], ' ')
                ELSE array_to_string(toks, ' ') END AS psm
    FROM s ORDER BY id
    """,
)
def x0_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — fill-in-the-middle training transform (round 8): half the
    corpus (a deterministic md5 coin on the doc id) reorders to PSM —
    ``<PRE> prefix <SUF> suffix <MID> middle`` with content-keyed
    split points — so an autoregressive LM learns infilling from
    plain next-token loss (the code-LLM staple); the other half passes
    through. Everything (coin, cuts) hashes the DOC ID, so the same
    document transforms identically on every run, engine, and retry —
    what a resumable 100 TB preprocessing job needs. Pure codegen:
    tokenize once, three slices, sentinel join; no explode, no
    shuffle. The oracle checks the exact transformed string per doc
    (operators/chunking.py:fim_transform)."""
    from vectordb_migrator_spark.operators.chunking import fim_transform

    return fim_transform(
        _t(spark, sf_dir, "documents"), fim_rate=2
    ).orderBy("id")


@query(
    "x6_thumbnail",
    r"""
    SELECT doc_id, 4::INT AS tw, 4::INT AS th,
           array_to_string(
             flatten(flatten(
               [[[ (doc_id % 256)::VARCHAR,
                   (3 * ((i * (8 + (doc_id % 3) * 4)) // 4))::VARCHAR,
                   ((j * (15 + (doc_id % 5) * 7)) // 4)::VARCHAR ]
                 for j in range(0, 4)]
                for i in range(0, 4)]
             )), ',') AS thumb_csv
    FROM documents ORDER BY doc_id
    """,
)
def x6_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — REAL image RESIZE on real decoded pixels (round 8): the
    fingerprint step every perceptual image-dedup pipeline starts
    with (aHash/dHash are a threshold away from this output). Decode
    the shared gradient BMP fixtures, nearest-neighbor downsample to
    a 4×4 grid (src = (dst·size)//4 floor map, one np.ix_ fancy index
    per image), and emit the full row-major RGB grid as a CSV — the
    oracle replays every sampled pixel's value AND position
    closed-form from the gradient formulas, so the decode, the row
    flip, the padding, and the index map are all pinned. Payloads
    never shuffle; output is 48 ints per image
    (operators/multimodal.py:thumbnail_features)."""
    from vectordb_migrator_spark.operators.multimodal import (
        THUMB_SCHEMA,
        fused_fixture_features,
        thumbnail_row,
    )
    from vectordb_migrator_spark.suite.s06_multimodal import (
        bmp_gradient_payload,
    )

    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        bmp_gradient_payload,
        thumbnail_row,
        THUMB_SCHEMA,
    ).orderBy("doc_id")


@query(
    "x7_bh_fdr",
    """
    WITH t AS (SELECT event_type,
                      CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS isa,
                      value
               FROM events
               WHERE value IS NOT NULL AND user_id IS NOT NULL),
    c AS (SELECT event_type, value AS val,
                 sum(isa)::BIGINT AS ca,
                 sum(1 - isa)::BIGINT AS cb
          FROM t GROUP BY 1, 2),
    w AS (SELECT event_type,
                 sum(ca) OVER (PARTITION BY event_type ORDER BY val
                               ROWS UNBOUNDED PRECEDING) AS cum_a,
                 sum(cb) OVER (PARTITION BY event_type ORDER BY val
                               ROWS UNBOUNDED PRECEDING) AS cum_b,
                 sum(ca) OVER (PARTITION BY event_type) AS na,
                 sum(cb) OVER (PARTITION BY event_type) AS nb
          FROM c),
    a AS (SELECT event_type,
                 max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
                 round(max(abs(cum_a::DOUBLE / na - cum_b::DOUBLE / nb)),
                       6) AS d
          FROM w GROUP BY 1),
    l AS (SELECT event_type,
                 d * d * (n_a::DOUBLE * n_b) / (n_a::DOUBLE + n_b) AS lam2
          FROM a),
    pv AS (SELECT event_type,
                  round(least(1.0, greatest(0.0,
                    2.0 * (exp(-2.0 * lam2) - exp(-8.0 * lam2)
                           + exp(-18.0 * lam2) - exp(-32.0 * lam2)
                           + exp(-50.0 * lam2)))), 6) AS p
           FROM l),
    r AS (SELECT event_type, p,
                 row_number() OVER (ORDER BY p, event_type) AS rank,
                 count(*) OVER () AS m
          FROM pv),
    b AS (SELECT event_type, p, rank::BIGINT AS rank,
                 round(0.10 * rank / m, 6) AS bh_threshold
          FROM r)
    SELECT event_type, p, rank, bh_threshold,
           rank <= max(CASE WHEN p <= bh_threshold THEN rank ELSE 0 END)
                     OVER () AS discovery
    FROM b ORDER BY rank
    """,
)
def x7_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — Benjamini–Hochberg FDR control over a per-slice test
    battery (round 8): one KS test per event type (variant a vs b on
    the value distribution), Kolmogorov-series p-values, then the
    step-up rule decides which rejections survive multiplicity — the
    mandatory correction between "k slices crossed alpha" and paging
    someone (at 5 slices it matters; at the 10^4-slice batteries the
    monitoring family emits, uncorrected alpha IS the pager noise).
    The KS fold is the shared distinct-value kernel (no rank over raw
    events); p ranks on round-6 values with the slice as tie-break so
    the discovery set is engine-reproducible; the BH window runs on
    the m-row battery, never the data
    (operators/scale.py:ks_p_value, bh_fdr)."""
    from vectordb_migrator_spark.operators.scale import (
        bh_fdr,
        ks_p_value,
        ks_test,
    )

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    trials = ev.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("v"),
        "value",
    )
    ks = ks_test(
        trials, "value", side_col="v", side_a="a", group_cols=["event_type"]
    )
    tests = ks.select(
        "event_type",
        ks_p_value(F.col("d"), F.col("n_a"), F.col("n_b")).alias("p"),
    )
    return bh_fdr(tests, p_col="p", key_cols=["event_type"], q=0.10)


@query(
    "x6_ahash_clusters",
    r"""
    WITH g AS (
      SELECT doc_id,
        flatten([[ (doc_id % 256)
                   + 3 * ((i * (8 + (doc_id % 3) * 4)) // 4)
                   + ((j * (15 + (doc_id % 5) * 7)) // 4)
                  for j in range(0, 4)]
                 for i in range(0, 4)]) AS gray
      FROM documents
    ), h AS (
      SELECT doc_id,
             array_to_string(
               [CASE WHEN x * 16 > list_sum(gray) THEN '1' ELSE '0' END
                for x in gray], '') AS ahash
      FROM g
    )
    SELECT ahash, count(*)::BIGINT AS n_images,
           min(doc_id)::BIGINT AS min_id, max(doc_id)::BIGINT AS max_id
    FROM h GROUP BY ahash ORDER BY ahash
    """,
)
def x6_ahash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — perceptual average-hash dedup on REAL decoded pixels
    (round 8), the back half of the pipeline x6_thumbnail opened:
    4×4 nearest-neighbor thumb → integer gray = r+g+b per cell →
    bit = cell·16 > Σgray (the integer-exact "above the mean") →
    16-bit string; equal strings are perceptual near-dup clusters
    (robust to scaling and brightness-preserving edits by
    construction of the hash). The whole pipeline is integer
    arithmetic on decoded bytes, so the cluster table carries a full
    closed-form oracle from the gradient-fixture formulas. Grouping
    is one map-side-combinable aggregate on a 16-char key
    (operators/multimodal.py:ahash_features)."""
    from vectordb_migrator_spark.operators.multimodal import (
        AHASH_SCHEMA,
        ahash_row,
        fused_fixture_features,
    )
    from vectordb_migrator_spark.suite.s06_multimodal import (
        bmp_gradient_payload,
    )

    h = fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        bmp_gradient_payload,
        ahash_row,
        AHASH_SCHEMA,
    )
    return (
        h.groupBy("ahash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.min("doc_id").cast("long").alias("min_id"),
            F.max("doc_id").cast("long").alias("max_id"),
        )
        .orderBy("ahash")
    )
