"""Registry family ``s09_extensions_b`` — split from the monolithic
suite.py (round 8); registration order preserved via the
package ``__init__`` import sequence."""

from __future__ import annotations

# ruff: noqa: E501
from vectordb_migrator_spark.suite._shared import (
    DataFrame,
    F,
    ORACLES,
    SparkSession,
    W,
    _PLANES,
    _PROBE_SQL,
    _probe_vector,
    _t,
    cosine_topk,
    lang_id,
    pq_adc_topk,
    pq_sampled_codebooks,
    query,
    token_count_ws,
)
from vectordb_migrator_spark.suite.s04_similarity import _plane_sig_sql
from vectordb_migrator_spark.suite.s05_text import _langid_case_sql
from vectordb_migrator_spark.suite.s09_extensions_a import (
    _FHB_SQL,
    _FHV_SQL,
)



@query(
    "x13_journey_entropy",
    """
    WITH p AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_state
      FROM events WHERE user_id IS NOT NULL
    ),
    c AS (
      SELECT from_state, to_state, count(*)::BIGINT AS n
      FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2
    ),
    w AS (
      SELECT from_state, to_state, n,
             sum(n) OVER (PARTITION BY from_state) AS row_tot,
             sum(n) OVER () AS tot
      FROM c
    )
    SELECT from_state,
           sum(n)::BIGINT AS n_transitions,
           round(sum(n)::DOUBLE / max(tot), 6) AS share,
           round(-sum((n::DOUBLE / row_tot)
                      * log2(n::DOUBLE / row_tot)), 6) AS entropy_bits
    FROM w GROUP BY from_state ORDER BY from_state
    """,
)
def x13_journey_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — journey predictability (round 7): the Shannon entropy of
    each state's transition row from the SAME lag-1 fold as
    ``x13_markov_transitions`` — near 0 bits means the next action is
    predetermined (prefetch/cache it), near log₂(s) means the journey
    is noise (stop personalizing on it); the weighted sum is the
    chain's conditional entropy. One per-user window pass folding to
    the s×s frame; the entropy math runs on that tiny table. Full
    oracle."""
    from vectordb_migrator_spark.operators.relational import (
        transition_matrix,
    )

    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    tm = transition_matrix(
        ev,
        unit_col="user_id",
        state_col="event_type",
        order_col="ts",
        tiebreak_col="event_id",
    )
    from pyspark.sql import Window

    tot = F.sum("n").over(Window.partitionBy())
    row_tot = F.sum("n").over(Window.partitionBy("from_state"))
    frac = F.col("n") / row_tot
    return (
        tm.withColumn("__tot", tot)
        .withColumn("__h", -frac * F.log2(frac))
        .groupBy("from_state")
        .agg(
            F.sum("n").cast("long").alias("n_transitions"),
            F.round(F.sum("n") / F.max("__tot"), 6).alias("share"),
            F.round(F.sum("__h"), 6).alias("entropy_bits"),
        )
        .orderBy("from_state")
    )


@query(
    "x13_markov_transitions",
    """
    WITH p AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_state
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT from_state, to_state, count(*)::BIGINT AS n,
           round(count(*)::DOUBLE
                 / sum(count(*)) OVER (PARTITION BY from_state), 6) AS p
    FROM p WHERE to_state IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def x13_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — first-order Markov transition matrix of user event types
    (round 7): each user's events ordered by (ts, event_id), every
    state paired with its successor, counts row-normalized to
    transition probabilities — the user-journey model behind "what
    happens after a click" and process-flow anomaly screens (a
    transition that never used to happen is a bug or fraud signal).
    One window pass partitioned BY USER (per-unit sort, never global)
    folding to an s×s frame however large the log; the unique
    event_id tiebreak makes same-timestamp sequences reproducible
    (operators/relational.py:transition_matrix). Full oracle."""
    from vectordb_migrator_spark.operators.relational import (
        transition_matrix,
    )

    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    return transition_matrix(
        ev,
        unit_col="user_id",
        state_col="event_type",
        order_col="ts",
        tiebreak_col="event_id",
    )


@query(
    "x0_market_basket",
    """
    WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
               FROM lineitem),
    n AS (SELECT count(DISTINCT o)::DOUBLE AS nb FROM b),
    it AS (SELECT i, count(*)::BIGINT AS n_i FROM b GROUP BY 1),
    p AS (SELECT a.i AS item_a, b2.i AS item_b,
                 count(*)::BIGINT AS n_ab
          FROM b a JOIN b b2 ON a.o = b2.o AND a.i < b2.i
          GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT item_a, item_b, n_ab,
           round(n_ab / n.nb, 6) AS support,
           round(n_ab::DOUBLE / ia.n_i, 6) AS conf_a_b,
           round(n_ab::DOUBLE / ib.n_i, 6) AS conf_b_a,
           round(n.nb * n_ab / (ia.n_i * ib.n_i), 6) AS lift
    FROM p
    CROSS JOIN n
    JOIN it ia ON ia.i = p.item_a
    JOIN it ib ON ib.i = p.item_b
    ORDER BY lift DESC, item_a, item_b LIMIT 20
    """,
)
def x0_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — market-basket association rules over order baskets (round
    7): top-20 part pairs by lift with support ≥ 3 orders — the
    frequently-bought-together primitive (and, read as "documents
    sharing a training batch", the co-occurrence shape behind
    curriculum diagnostics). Pairs generate INSIDE each basket's
    collected item list (one shuffle, bounded by basket size);
    marginals broadcast; top-k via TakeOrderedAndProject
    (operators/relational.py:association_rules). Full oracle."""
    from vectordb_migrator_spark.operators.relational import (
        association_rules,
    )

    return association_rules(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_count=3,
        top_k=20,
    )


@query(
    "x0_pareto_parts",
    """
    WITH per AS (
      SELECT l_partkey AS k,
             sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,6))
               AS s
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT k, s,
             sum(s) OVER (ORDER BY s DESC, k
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(s) OVER () AS tot
      FROM per
    ),
    cls AS (
      SELECT k, s, tot,
             CASE WHEN round(cum::DOUBLE / tot::DOUBLE, 6) <= 0.8
                    THEN 'A'
                  WHEN round(cum::DOUBLE / tot::DOUBLE, 6) <= 0.95
                    THEN 'B'
                  ELSE 'C' END AS class
      FROM c
    )
    SELECT class, count(*)::BIGINT AS n_keys,
           round(sum(s::DOUBLE), 2) AS total_value,
           round(sum(s::DOUBLE) / max(tot::DOUBLE), 6) AS value_share
    FROM cls GROUP BY class ORDER BY class
    """,
)
def x0_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — ABC/Pareto classification of parts by revenue (round 7):
    rank parts by discounted revenue, class the heads covering 80% of
    value A, to 95% B, the tail C, and report each class's key count
    and value share — the 80/20 analysis behind inventory tiers,
    hot-content caching, and "which 5% of sources are 80% of tokens"
    in a training mix. One exact-decimal grouped aggregate reduces
    the corpus to a per-key frame; the only global sort is over KEYS
    (operators/relational.py:pareto_classes). Full oracle."""
    from vectordb_migrator_spark.operators.relational import (
        pareto_classes,
    )

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "rev", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    per_key = pareto_classes(li, key_col="l_partkey", value_col="rev")
    from pyspark.sql import Window

    tot = F.sum("total").over(Window.partitionBy())
    return (
        per_key.withColumn("__tot", tot)
        .groupBy("class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.round(F.sum("total"), 2).alias("total_value"),
            F.round(F.sum("total") / F.max("__tot"), 6).alias(
                "value_share"
            ),
        )
        .orderBy("class")
    )


@query(
    "x13_forecast_backtest",
    """
    WITH daily AS (
      SELECT event_type, ts::DATE AS day, round(sum(value), 6) AS v
      FROM events GROUP BY 1, 2
    ),
    lagd AS (
      SELECT event_type, day, v,
             lag(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS fs,
             lag(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS fn,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY day DESC) AS rn
      FROM daily
    )
    SELECT event_type, count(*)::BIGINT AS n_scored,
           round(avg(abs(fs - v)), 6) AS mae,
           round(sqrt(avg((fs - v) * (fs - v))), 6) AS rmse,
           round(avg(2.0 * abs(fs - v) / nullif(abs(fs) + abs(v), 0)), 6)
             AS smape,
           round(avg(abs(fs - v)) / nullif(avg(abs(fn - v)), 0), 6)
             AS skill
    FROM lagd WHERE rn <= 7 AND fs IS NOT NULL AND fn IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def x13_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — seasonal-naive forecast backtest per event type (round
    7): score ŷ_t = y_{t−7} over each series' last week against the
    naive-1 baseline (MAE/RMSE/sMAPE + the skill ratio) — the honest
    pre-model question for any per-key volume forecast, and the
    monitor that catches a series whose weekly cycle silently died
    (skill drifts to ≥ 1). The lag windows run on the pre-aggregated
    daily frame — thousands of rows however big the raw log
    (operators/timeseries.py:seasonal_naive_backtest). Full oracle."""
    from vectordb_migrator_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    return seasonal_naive_backtest(
        daily, group_cols=["event_type"], season=7, horizon=7
    )


@query(
    "x13_theil_sen",
    """
    WITH daily AS (
      SELECT event_type, ts::DATE AS day, round(sum(value), 6) AS v
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, (day - DATE '1970-01-01')::DOUBLE AS t, v
      FROM daily
    ),
    pairs AS (
      SELECT a.event_type, (b.v - a.v) / (b.t - a.t) AS s
      FROM base a
      JOIN base b ON a.event_type = b.event_type AND b.t > a.t
    ),
    sl AS (SELECT event_type, quantile_cont(s, 0.5) AS slope
           FROM pairs GROUP BY 1)
    SELECT b.event_type, count(*)::BIGINT AS n_days,
           round(max(sl.slope), 6) AS slope_per_day,
           round(quantile_cont(b.v - sl.slope * b.t, 0.5), 6)
             AS intercept
    FROM base b JOIN sl USING (event_type)
    GROUP BY b.event_type ORDER BY b.event_type
    """,
)
def x13_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — Theil–Sen robust trend per event type (round 7): slope =
    exact median of all pairwise daily slopes, intercept = median of
    the slope-adjusted levels — the trend estimator that shrugs off
    the outlier days least squares chases (breakdown point 29%),
    reported per series as value-units-per-day. O(n²) pairs is safe
    BECAUSE it runs on the daily rollup (a year is ~66k pairs per
    key); the raw event log never self-joins
    (operators/timeseries.py:theil_sen_trend). Full oracle —
    quantile_cont interpolates identically to Spark's percentile."""
    from vectordb_migrator_spark.operators.timeseries import (
        theil_sen_trend,
    )

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    return theil_sen_trend(daily, group_cols=["event_type"])


@query(
    "x13_seasonal_anomalies",
    """
    WITH s AS (
      SELECT event_type, extract(hour FROM ts)::INT AS hod,
             avg(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY 1, 2
    ),
    z AS (
      SELECT e.event_id, e.event_type, e.value,
             CASE WHEN s.sd IS NULL OR s.sd = 0 THEN NULL
                  ELSE round((e.value - s.mu) / s.sd, 6) END AS z
      FROM events e
      JOIN s ON s.event_type = e.event_type
            AND s.hod = extract(hour FROM e.ts)::INT
    )
    SELECT event_id, event_type, value, z
    FROM z WHERE abs(z) >= 3.0 ORDER BY event_id
    """,
)
def x13_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — seasonality-aware anomalies: z-score against the (key,
    hour-of-day) baseline so diurnal rhythm stops reading as outliers.
    One 24×keys stats aggregate broadcast back into the scan; no
    per-key window funnel."""
    from vectordb_migrator_spark.operators.timeseries import (
        seasonal_zscore_anomalies,
    )

    return (
        seasonal_zscore_anomalies(_t(spark, sf_dir, "events"), threshold=3.0)
        .select("event_id", "event_type", "value", "z")
        .orderBy("event_id")
    )


@query(
    "x12_snapshot_diff",
    r"""
    WITH old AS (SELECT doc_id, text FROM documents),
    coin AS (
      SELECT doc_id, text,
             CAST(CONCAT('0x', substr(md5(concat('v2:', doc_id)), 1, 8))
                  AS BIGINT) / 4294967296.0 AS c
      FROM documents
    ),
    kept AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]'
                  ELSE text END AS text
      FROM coin WHERE c >= 0.1
    ),
    addedrows AS (
      SELECT doc_id + 1000000 AS doc_id, text FROM kept WHERE doc_id % 17 = 0
    ),
    newv AS (SELECT * FROM kept UNION ALL SELECT * FROM addedrows),
    of AS (SELECT doc_id, md5(text) AS ofp FROM old),
    nf AS (SELECT doc_id, md5(text) AS nfp FROM newv),
    j AS (SELECT * FROM of FULL OUTER JOIN nf USING (doc_id))
    SELECT
      sum(CASE WHEN ofp IS NULL THEN 1 ELSE 0 END)::BIGINT AS added,
      sum(CASE WHEN nfp IS NULL THEN 1 ELSE 0 END)::BIGINT AS removed,
      sum(CASE WHEN ofp IS NOT NULL AND nfp IS NOT NULL AND ofp != nfp
               THEN 1 ELSE 0 END)::BIGINT AS changed,
      sum(CASE WHEN ofp = nfp THEN 1 ELSE 0 END)::BIGINT AS unchanged,
      round((sum(CASE WHEN ofp IS NULL THEN 1 ELSE 0 END)
             + sum(CASE WHEN nfp IS NULL THEN 1 ELSE 0 END)
             + sum(CASE WHEN ofp IS NOT NULL AND nfp IS NOT NULL
                        AND ofp != nfp THEN 1 ELSE 0 END))
            / greatest(sum(CASE WHEN ofp IS NOT NULL THEN 1 ELSE 0 END), 1),
            6) AS churn_vs_old
    FROM j
    """,
)
def x12_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — release-to-release snapshot diff (round 6): added /
    removed / changed / unchanged counts and the churn rate between
    two corpus versions (:func:`~vectordb_migrator_spark.operators
    .validation.dataset_diff`) — the report a release pipeline logs
    next to its dataset card before publishing v2. The "v2" here is
    DERIVED deterministically from the fixture (md5-coin removes ~10%,
    every 13th doc's text is revised, every 17th kept doc is
    duplicated under a new id), so the oracle rebuilds the identical
    snapshot pair from the same parquet. Scale shape: each side
    reduces to (id, md5 fingerprint) — the payload never crosses an
    exchange — then one full-outer id join + one aggregate."""
    from vectordb_migrator_spark.operators.validation import dataset_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("v2:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    kept = docs.withColumn("__c", coin).filter(F.col("__c") >= 0.1).drop("__c")
    changed = kept.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat("text", F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    )
    added = changed.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    v2 = changed.unionAll(added)
    return dataset_diff(docs, v2, content_cols=["text"])


@query(
    "x12_layout_advisor",
    r"""
    WITH unp AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus::VARCHAR AS v FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority::VARCHAR FROM orders
      UNION ALL
      SELECT 'o_custkey', o_custkey::VARCHAR FROM orders
      UNION ALL
      SELECT 'o_orderdate', o_orderdate::VARCHAR FROM orders
    ),
    per AS (
      SELECT col, v, count(*)::BIGINT AS n FROM unp GROUP BY col, v
    ),
    stats AS (
      SELECT col,
             count(CASE WHEN v IS NOT NULL THEN 1 END)::BIGINT AS ndv,
             sum(CASE WHEN v IS NULL THEN n ELSE 0 END)::BIGINT AS nulls,
             sum(n)::BIGINT AS total,
             max(CASE WHEN v IS NOT NULL THEN n ELSE 0 END)::BIGINT AS top1
      FROM per GROUP BY col
    )
    SELECT col, ndv,
           round(nulls::DOUBLE / total, 6) AS null_rate,
           round(top1::DOUBLE / total, 6) AS top1_share,
           CASE WHEN ndv <= 50 THEN 'partition'
                WHEN ndv <= 10000 THEN 'zorder'
                ELSE 'bucket' END AS recommendation
    FROM stats ORDER BY col
    """,
)
def x12_layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — data-layout advisor (round 6): per candidate column, the
    statistics that drive a 100 TB layout decision — exact NDV, null
    rate, hottest-value share (the skew signal) — and a deterministic
    recommendation: low-cardinality → hive PARTITION column (directory
    pruning), mid-cardinality → Z-ORDER clustering (row-group
    pruning), high-cardinality → BUCKET column (co-located joins) —
    feeding the `scale.write_partitioned`/`zorder_write`/
    `write_bucketed` trio this repo already ships. ONE scan: columns
    unpivot via `stack` into (col, value) pairs, one grouped count,
    then per-column rollup — no per-column re-scan, and the skew
    evidence (`top1_share`) is exactly what decides salting. The
    thresholds are explicit and oracle-replicated; a real deployment
    tunes them to its file-count budget."""
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate"]
    stack_expr = "stack({}, {}) as (col, v)".format(
        len(cols),
        ", ".join(f"'{c}', cast({c} as string)" for c in cols),
    )
    per = (
        _t(spark, sf_dir, "orders")
        .selectExpr(stack_expr)
        .groupBy("col", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    stats = per.groupBy("col").agg(
        F.count(F.when(F.col("v").isNotNull(), 1)).cast("long").alias("ndv"),
        F.sum(F.when(F.col("v").isNull(), F.col("n")).otherwise(0))
        .cast("long")
        .alias("nulls"),
        F.sum("n").cast("long").alias("total"),
        F.max(F.when(F.col("v").isNotNull(), F.col("n")).otherwise(0))
        .cast("long")
        .alias("top1"),
    )
    return stats.select(
        "col",
        "ndv",
        F.round(F.col("nulls") / F.col("total"), 6).alias("null_rate"),
        F.round(F.col("top1") / F.col("total"), 6).alias("top1_share"),
        F.when(F.col("ndv") <= 50, "partition")
        .when(F.col("ndv") <= 10000, "zorder")
        .otherwise("bucket")
        .alias("recommendation"),
    ).orderBy("col")


@query(
    "x12_corpus_alignment",
    """
    SELECT
      (SELECT count(*) FROM documents d
       WHERE NOT EXISTS (SELECT 1 FROM embeddings e
                         WHERE e.vec_id = d.doc_id))::BIGINT
        AS docs_without_embedding,
      (SELECT count(*) FROM embeddings e
       WHERE NOT EXISTS (SELECT 1 FROM documents d
                         WHERE d.doc_id = e.vec_id))::BIGINT
        AS embeddings_without_doc,
      (SELECT count(*) FROM documents)::BIGINT AS n_docs,
      (SELECT count(*) FROM embeddings)::BIGINT AS n_embeddings
    """,
)
def x12_corpus_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — corpus⇄embedding alignment audit: orphan documents (no
    embedding row) and orphan embeddings (no document), the pre-flight
    check before manifest assembly — BOTH directions matter, unlike
    the one-directional FK audit in ``x12_referential_integrity``.
    Two anti-joins + two counts, all id-keyed — at scale each
    anti-join is one shuffle of ids only (AQE broadcasts the smaller
    id set)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    d_ids = docs.select(F.col("doc_id").alias("id"))
    e_ids = emb.select(F.col("vec_id").alias("id"))
    orphans_d = d_ids.join(e_ids, "id", "left_anti").agg(
        F.count("*").alias("docs_without_embedding")
    )
    orphans_e = e_ids.join(d_ids, "id", "left_anti").agg(
        F.count("*").alias("embeddings_without_doc")
    )
    totals = docs.agg(F.count("*").alias("n_docs")).crossJoin(
        emb.agg(F.count("*").alias("n_embeddings"))
    )
    return (
        orphans_d.crossJoin(orphans_e)
        .crossJoin(totals)
        .select(
            F.col("docs_without_embedding").cast("long").alias(
                "docs_without_embedding"
            ),
            F.col("embeddings_without_doc").cast("long").alias(
                "embeddings_without_doc"
            ),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_embeddings").cast("long").alias("n_embeddings"),
        )
    )


@query(
    "x13_rolling_corr",
    """
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hour,
             coalesce(sum(value) FILTER (WHERE event_type = 'view'), 0)
               AS a,
             coalesce(sum(value) FILTER (WHERE event_type = 'click'), 0)
               AS b
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY 1
    )
    SELECT hour, a, b,
           round(corr(a, b) OVER (
             ORDER BY hour
             RANGE BETWEEN INTERVAL 23 HOURS PRECEDING AND CURRENT ROW),
             6) AS corr
    FROM h ORDER BY hour
    """,
)
def x13_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — rolling 24h Pearson correlation between the view and
    click hourly series: the co-movement diagnostic. One hourly
    pre-agg shuffle collapses raw events; the window slides over the
    tiny series (state = 24 rows), with corr spelled via try_divide
    so zero-variance windows yield NULL like SQL corr."""
    from vectordb_migrator_spark.operators.timeseries import rolling_correlation

    return rolling_correlation(
        _t(spark, sf_dir, "events"),
        key_a="view",
        key_b="click",
        window_hours=24,
    ).orderBy("hour")


@query(
    "x12_contract_enforce",
    """
    WITH g AS (
      SELECT coalesce(array_to_string(list_sort(list_filter([
               CASE WHEN value <= 100 THEN NULL ELSE 'value_le_100' END,
               CASE WHEN event_type IN ('view','click','purchase','signup')
                    THEN NULL ELSE 'known_type' END,
               CASE WHEN value > 0 THEN NULL ELSE 'value_positive' END,
               CASE WHEN user_id IS NOT NULL THEN NULL
                    ELSE 'user_present' END
             ], x -> x IS NOT NULL)), ','), '') AS combo
      FROM events
    ),
    c AS (SELECT combo, count(*)::BIGINT AS n FROM g GROUP BY combo)
    SELECT combo, n, round(n / sum(n) OVER (), 6) AS share
    FROM c ORDER BY n DESC, combo
    """,
)
def x12_contract_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — row-level contract enforcement with quarantine triage
    (round 7): the OTHER half of the deequ niche next to
    ``x12_quality_constraints``' aggregate verdicts — every event row
    is gated against named rules (value cap, known type, positive
    value, user present; NULL predicate = violation) and the summary
    counts each distinct violation COMBINATION, the table that says
    whether bad rows share one root cause or are scattered. The gate
    is one codegen projection (no shuffle, no rescan — clean and
    quarantine routes share the same gated scan); the combo rollup is
    one map-side-combinable count. Full oracle."""
    from vectordb_migrator_spark.operators.validation import (
        quarantine_summary,
    )

    ev = _t(spark, sf_dir, "events")
    return quarantine_summary(
        ev,
        [
            ("value_le_100", F.col("value") <= 100),
            (
                "known_type",
                F.col("event_type").isin(
                    "view", "click", "purchase", "signup"
                ),
            ),
            ("value_positive", F.col("value") > 0),
            ("user_present", F.col("user_id").isNotNull()),
        ],
    )


_RI_RELATIONS = [
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
]


def _ri_sql() -> str:
    parts = []
    for name, child, ck, parent, pk in _RI_RELATIONS:
        parts.append(f"""
    SELECT '{name}' AS relation,
           count(*)::BIGINT AS child_rows,
           (count(*) FILTER (WHERE c.{ck} IS NULL))::BIGINT AS null_keys,
           (count(*) FILTER (WHERE c.{ck} IS NOT NULL
                               AND p.{pk} IS NULL))::BIGINT AS orphans,
           round((count(*) FILTER (WHERE c.{ck} IS NOT NULL
                                     AND p.{pk} IS NULL))::DOUBLE
                 / (count(*) FILTER (WHERE c.{ck} IS NOT NULL)), 6)
             AS orphan_rate
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
      ON p.{pk} = c.{ck}""")
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY relation"
    )


@query("x12_referential_integrity", _ri_sql())
def x12_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — foreign-key integrity audit over the warehouse's six FK
    relations (round 7): per relation, child cardinality, NULL-key
    count (SQL FK semantics — a NULL reference is not an orphan but
    surfaces separately), orphan count, and orphan rate. The
    cross-TABLE companion of ``x12_quality_constraints``'s row-level
    gate: a nonzero row names exactly which downstream join will
    silently drop rows, and release pipelines assert the orphans
    column is all-zero before publishing. Each relation is an
    id-width left-anti join against the distinct parent key
    (broadcast for dim-sized parents, shuffle otherwise — Catalyst
    picks from stats) plus a count-only aggregate; relations audit
    independently (operators/validation.py:referential_audit).

    Bench note (r7 verdict watch item): ~1.5-2s at sf0.1 is this
    audit's honest cost — three of the six relations each fold the
    full lineitem table to a (key, count) aggregate, so the audit
    does ~3 lineitem-sized aggregations plus small-stage scheduling
    for six independent sub-plans. A tagged-union single-join variant
    measures identical (2.2s vs 2.2s warm): the time is the child
    folds, not the join fan. Round 8 halved the I/O (one child scan
    per relation instead of two, key-width join input instead of
    row-width) — the remaining cost scales with child bytes, which
    is what an FK audit must read."""
    from vectordb_migrator_spark.operators.validation import (
        referential_audit,
    )

    tables = {
        t: _t(spark, sf_dir, t)
        for t in {
            "customer", "lineitem", "orders", "part", "supplier", "nation"
        }
    }
    return referential_audit(
        [
            (name, tables[child], ck, tables[parent], pk)
            for name, child, ck, parent, pk in _RI_RELATIONS
        ]
    )


def _psi_sql() -> str:
    probs = [round(0.1 * i, 1) for i in range(1, 10)]
    case = " ".join(
        f"WHEN t.value <= e.q[{i + 1}] THEN {i + 1}"
        for i in range(len(probs))
    )
    return f"""
    WITH m AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid
               FROM events),
    tagged AS (
      SELECT event_type, value,
             CASE WHEN epoch(ts) <= m.mid THEN 'ref' ELSE 'cur' END AS side
      FROM events, m WHERE value IS NOT NULL
    ),
    e AS (
      SELECT event_type, quantile_cont(value, {probs}) AS q
      FROM tagged WHERE side = 'ref' GROUP BY event_type
    ),
    binned AS (
      SELECT t.event_type, t.side,
             CASE {case} ELSE {len(probs) + 1} END AS bin
      FROM tagged t JOIN e USING (event_type)
    ),
    counts AS (SELECT event_type, side, bin, count(*)::BIGINT AS n
               FROM binned GROUP BY 1, 2, 3),
    shares AS (
      SELECT event_type, side, bin, n,
             n::DOUBLE / sum(n) OVER (PARTITION BY event_type, side)
               AS share
      FROM counts
    ),
    r AS (SELECT event_type, bin, share AS ref_share, n AS ref_n
          FROM shares WHERE side = 'ref'),
    c AS (SELECT event_type, bin, share AS cur_share, n AS cur_n
          FROM shares WHERE side = 'cur'),
    b AS (
      SELECT coalesce(r.event_type, c.event_type) AS event_type,
             coalesce(ref_share, 0) AS pr0,
             coalesce(cur_share, 0) AS pc0,
             coalesce(ref_n, 0) AS ref_n,
             coalesce(cur_n, 0) AS cur_n
      FROM r FULL OUTER JOIN c
        ON r.event_type = c.event_type AND r.bin = c.bin
    )
    SELECT event_type,
           sum(ref_n)::BIGINT AS n_ref,
           sum(cur_n)::BIGINT AS n_cur,
           round(sum((greatest(pc0, 1e-6) - greatest(pr0, 1e-6))
                     * ln(greatest(pc0, 1e-6) / greatest(pr0, 1e-6))),
                 6) AS psi,
           round(sum((greatest(pc0, 1e-6) - greatest(pr0, 1e-6))
                     * ln(greatest(pc0, 1e-6) / greatest(pr0, 1e-6))),
                 6) > 0.2 AS drifted
    FROM b GROUP BY event_type ORDER BY event_type
    """


@query(
    "x10_source_ablation",
    r"""
    WITH per AS (
      SELECT source,
             count(*)::BIGINT AS n,
             sum(len(string_split_regex(lower(trim(text)), '\s+'))
                 ::DECIMAL(28,6)) AS s
      FROM documents GROUP BY source
    ),
    t AS (SELECT sum(n) AS nt, sum(s) AS st FROM per)
    SELECT source, n,
           round(s::DOUBLE / n, 6) AS mean_tokens,
           round((t.st - per.s)::DOUBLE / (t.nt - per.n), 6)
             AS loo_mean,
           round((t.st - per.s)::DOUBLE / (t.nt - per.n)
                 - t.st::DOUBLE / t.nt, 6) AS delta_vs_all
    FROM per, t ORDER BY source
    """,
)
def x10_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — leave-one-source-out ablation of the corpus token
    profile (round 7): for each source, what the corpus-mean tokens
    per document becomes WITHOUT it — the closed-form data-valuation
    readout ("which feed is dragging the profile") that jackknife
    arithmetic gives for free from per-source aggregates: the naive
    loop costs one corpus pass PER source, this costs ONE total.
    Exact decimal sums make it engine-reproducible. Full oracle."""
    from vectordb_migrator_spark.functions.text import token_count_ws

    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            token_count_ws("text").cast("decimal(28,6)")
        ).alias("s"),
    )
    t = per.agg(F.sum("n").alias("nt"), F.sum("s").alias("st"))
    loo = (F.col("st") - F.col("s")).cast("double") / (
        F.col("nt") - F.col("n")
    ).cast("double")
    return (
        per.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n",
            F.round(
                F.col("s").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("mean_tokens"),
            F.round(loo, 6).alias("loo_mean"),
            F.round(
                loo
                - F.col("st").cast("double")
                / F.col("nt").cast("double"),
                6,
            ).alias("delta_vs_all"),
        )
        .orderBy("source")
    )


@query("x12_psi_drift", _psi_sql())
def x12_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — Population Stability Index drift between the event log's
    first and second time halves, per event type (round 7): bin both
    halves by the FIRST half's exact decile edges and report
    Σ (p_cur − p_ref)·ln(p_cur/p_ref) — the standard model-monitoring
    score (> 0.2 flags drift). Complements
    ``x12_source_profile_drift``'s mean ratios: PSI sees SHAPE changes
    (variance blowup, bimodality) a mean cannot. Edges reduce the
    reference to one interpolated-percentile row per group (no global
    sort); both halves union into ONE tagged scan binned by a
    broadcast when-chain, and the only exchange is the
    (groups × sides × 10-bin) count frame
    (operators/validation.py:psi_drift). Full oracle — quantile_cont
    interpolates identically to Spark's exact percentile."""
    from vectordb_migrator_spark.operators.validation import psi_drift

    ev = _t(spark, sf_dir, "events")
    mid = ev.agg(
        (
            (F.min(F.col("ts").cast("double"))
             + F.max(F.col("ts").cast("double"))) / 2
        ).alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid))
    ref = tagged.filter(F.col("ts").cast("double") <= F.col("mid"))
    cur = tagged.filter(F.col("ts").cast("double") > F.col("mid"))
    return psi_drift(
        ref, cur, "value", group_cols=["event_type"]
    )


_CORR_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


def _corr_sql() -> str:
    parts = []
    for i in range(len(_CORR_COLS)):
        for j in range(i + 1, len(_CORR_COLS)):
            a, b = _CORR_COLS[i], _CORR_COLS[j]
            parts.append(f"""
      SELECT '{a}' AS col_a, '{b}' AS col_b,
             count(*)::BIGINT AS n,
             sum(round({a}, 6)::DECIMAL(18,6)) AS sx,
             sum(round({b}, 6)::DECIMAL(18,6)) AS sy,
             sum(round({a}, 6)::DECIMAL(19,6)
                 * round({a}, 6)::DECIMAL(19,6)) AS sxx,
             sum(round({b}, 6)::DECIMAL(19,6)
                 * round({b}, 6)::DECIMAL(19,6)) AS syy,
             sum(round({a}, 6)::DECIMAL(19,6)
                 * round({b}, 6)::DECIMAL(19,6)) AS sxy
      FROM lineitem
      WHERE {a} IS NOT NULL AND {b} IS NOT NULL""")
    return (
        """
    WITH p AS ("""
        + " UNION ALL ".join(parts)
        + """
    )
    SELECT col_a, col_b, n,
           round((sxy::DOUBLE / n - (sx::DOUBLE / n) * (sy::DOUBLE / n))
                 / nullif(sqrt((sxx::DOUBLE / n
                                - (sx::DOUBLE / n) * (sx::DOUBLE / n))
                               * (syy::DOUBLE / n
                                  - (sy::DOUBLE / n) * (sy::DOUBLE / n))),
                          0), 6) AS corr
    FROM p ORDER BY col_a, col_b
    """
    )


@query("x12_corr_matrix", _corr_sql())
def x12_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — Pearson correlation matrix of lineitem's four measures in
    ONE scan (round 7): a single aggregate computes every pair's exact
    decimal moment sums (inputs 6dp-rounded, so the statistics are
    bit-reproducible across engines and partition orders), and the
    C(4,2) correlations unpivot from that one report row — the
    feature-redundancy / "which measures move together" profiling
    query, at one pass instead of ``df.stat.corr``'s rescan per pair.
    Pairwise NULL deletion handled in the same scan
    (operators/scale.py:corr_matrix). Full oracle."""
    from vectordb_migrator_spark.operators.scale import corr_matrix

    return corr_matrix(_t(spark, sf_dir, "lineitem"), _CORR_COLS)


_JC_RELATIONS = [
    ("customer_x_nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("lineitem_x_orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem_x_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders_x_customer", "orders", "o_custkey",
     "customer", "c_custkey"),
]


def _jc_sql() -> str:
    parts = []
    for name, lt, lk, rt, rk in _JC_RELATIONS:
        parts.append(f"""
      SELECT '{name}' AS relation,
             (SELECT count(*) FROM {lt})::BIGINT AS left_rows,
             (SELECT count(*) FROM {rt})::BIGINT AS right_rows,
             coalesce(count(*), 0)::BIGINT AS matched_keys,
             coalesce(sum(na * nb), 0)::BIGINT AS join_rows,
             coalesce(max(na * nb), 0)::BIGINT AS max_key_rows,
             round(coalesce(sum(na * nb), 0)::DOUBLE
                   / greatest((SELECT count(*) FROM {lt}),
                              (SELECT count(*) FROM {rt})), 6)
               AS expansion,
             round(coalesce(max(na * nb), 0)::DOUBLE
                   / nullif(coalesce(sum(na * nb), 0), 0), 6)
               AS top_key_share
      FROM (SELECT {lk} AS k, count(*)::BIGINT AS na
            FROM {lt} GROUP BY 1) a
      JOIN (SELECT {rk} AS k, count(*)::BIGINT AS nb
            FROM {rt} GROUP BY 1) b USING (k)""")
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY relation"
    )


@query("x12_join_cardinality", _jc_sql())
def x12_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — pre-join cardinality audit over four warehouse joins
    (round 7): the EXACT output size Σₖ c_left(k)·c_right(k),
    expansion factor, and hottest-key share — the measured answer to
    "is this join 1:1, a benign fan-out, or an explosion one hot key
    turns into a straggler" BEFORE submitting a 100 TB join (Catalyst
    estimates this from sampled stats; this is ground truth at
    id-width cost). Each side folds to a (key, count) frame — the
    only exchanges are id-width — and nothing of the join output
    materializes (operators/scale.py:join_cardinality). Full
    oracle."""
    from vectordb_migrator_spark.operators.scale import join_cardinality

    tables = {
        t: _t(spark, sf_dir, t)
        for t in {"customer", "nation", "lineitem", "orders", "part"}
    }
    return join_cardinality(
        [
            (name, tables[lt], lk, tables[rt], rk)
            for name, lt, lk, rt, rk in _JC_RELATIONS
        ]
    )


_ZM_LAYOUTS = [
    ("by_custkey", "o_custkey"),
    ("by_orderdate", "o_orderdate"),
    ("by_totalprice", "o_totalprice"),
]
_ZM_LO, _ZM_HI, _ZM_CHUNKS = 100000.0, 150000.0, 64


def _zonemap_sql() -> str:
    parts = []
    for label, oc in _ZM_LAYOUTS:
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
        SELECT mx >= {_ZM_LO} AND mn <= {_ZM_HI} AS hit, rows, matching
        FROM (
          SELECT min(v) AS mn, max(v) AS mx, count(*)::BIGINT AS rows,
                 sum(CASE WHEN v BETWEEN {_ZM_LO} AND {_ZM_HI}
                     THEN 1 ELSE 0 END)::BIGINT AS matching
          FROM (
            SELECT ntile({_ZM_CHUNKS})
                     OVER (ORDER BY {oc}, o_orderkey) AS chunk,
                   o_totalprice AS v
            FROM orders
          ) GROUP BY chunk
        )
      )""")
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY layout"
    )


@query("x12_zonemap_prune", _zonemap_sql())
def x12_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — zone-map data-skipping WHAT-IF simulator (round 7): for
    three candidate clusterings of the orders table, chunk the rows
    into 64 simulated row-groups in that order, keep each chunk's
    min/max of o_totalprice (exactly the stats parquet keeps per row
    group), and report how much a price-band predicate could skip.
    The advisor that quantifies what ``zorder_write`` /
    ``write_partitioned`` would buy BEFORE rewriting 100 TB:
    clustering by the predicate column prunes ~(1 − selectivity) of
    chunks, an uncorrelated layout prunes ~0 — next to
    ``x12_layout_advisor``'s cardinality heuristics this is the
    measured answer. Each layout sorts an id-width 3-column
    projection only; unique-key tiebreak keeps ntile deterministic
    (operators/scale.py:zonemap_prune_report). Full oracle."""
    from vectordb_migrator_spark.operators.scale import (
        zonemap_prune_report,
    )

    return zonemap_prune_report(
        _t(spark, sf_dir, "orders"),
        value_col="o_totalprice",
        lo=_ZM_LO,
        hi=_ZM_HI,
        layouts=_ZM_LAYOUTS,
        tiebreak_col="o_orderkey",
        n_chunks=_ZM_CHUNKS,
    )


@query(
    "x12_root_cause",
    """
    WITH m AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid
               FROM events),
    base AS (
      SELECT event_type,
             hour(ts)::VARCHAR AS hour_of_day,
             (((ts::DATE - DATE '1970-01-01') % 7)::INT)::VARCHAR
               AS day_of_week,
             CASE WHEN epoch(ts) <= m.mid THEN 'ref' ELSE 'cur' END
               AS side
      FROM events, m
    ),
    st AS (
      SELECT 'event_type' AS dim, event_type AS value, side FROM base
      UNION ALL
      SELECT 'hour_of_day', hour_of_day, side FROM base
      UNION ALL
      SELECT 'day_of_week', day_of_week, side FROM base
    ),
    counts AS (
      SELECT dim, value, side, count(*)::BIGINT AS n
      FROM st GROUP BY 1, 2, 3
    ),
    shares AS (
      SELECT dim, value, side, n,
             sum(n) OVER (PARTITION BY dim, side) AS tot
      FROM counts
    ),
    r AS (SELECT dim, value, n AS ref_n, tot AS ref_tot
          FROM shares WHERE side = 'ref'),
    c AS (SELECT dim, value, n AS cur_n, tot AS cur_tot
          FROM shares WHERE side = 'cur'),
    b0 AS (
      SELECT coalesce(r.dim, c.dim) AS dim,
             coalesce(r.value, c.value) AS value,
             coalesce(ref_n, 0) AS ref_n,
             coalesce(cur_n, 0) AS cur_n,
             ref_tot, cur_tot
      FROM r FULL OUTER JOIN c
        ON r.dim = c.dim AND r.value = c.value
    ),
    b AS (
      SELECT dim, value, ref_n, cur_n,
             max(ref_tot) OVER (PARTITION BY dim) AS ref_tot,
             max(cur_tot) OVER (PARTITION BY dim) AS cur_tot
      FROM b0
    ),
    s AS (
      SELECT dim, value, ref_n, cur_n,
             greatest(ref_n::DOUBLE / ref_tot, 1e-9) AS p,
             greatest(cur_n::DOUBLE / cur_tot, 1e-9) AS q,
             (cur_n - ref_n)::DOUBLE
               / nullif(cur_tot - ref_tot, 0) AS ep
      FROM b
    ),
    scored AS (
      SELECT dim, value, ref_n, cur_n,
             round(ep, 6) AS explanatory_power,
             round(0.5 * (p * ln(2 * p / (p + q))
                          + q * ln(2 * q / (p + q))), 6) AS surprise
      FROM s
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY dim
                                ORDER BY surprise DESC, value) AS rank
      FROM scored
    )
    SELECT dim, rank::BIGINT AS rank, value, ref_n, cur_n,
           explanatory_power, surprise
    FROM ranked WHERE rank <= 5 ORDER BY dim, rank
    """,
)
def x12_root_cause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — Adtributor-style root-cause attribution (round 7): the
    event volume moved between the log's time halves — which
    dimension value explains it? Per candidate dimension (event type,
    hour-of-day, day-of-week), each value's explanatory power (share
    of the total delta) and JS-divergence surprise (mix shift even
    when the total didn't move), top-5 per dimension — the incident
    drilldown that replaces eyeballing N group-bys. ONE tagged
    union scan folds all dimensions via a plan-side unpivot; the
    divergence math runs on the tiny count frame
    (operators/validation.py:root_cause_report). Full oracle."""
    from vectordb_migrator_spark.operators.validation import (
        root_cause_report,
    )

    ev = _t(spark, sf_dir, "events")
    mid = ev.agg(
        (
            (F.min(F.col("ts").cast("double"))
             + F.max(F.col("ts").cast("double"))) / 2
        ).alias("mid")
    )
    base = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.hour("ts").cast("string").alias("hour_of_day"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7)
        .cast("int")
        .cast("string")
        .alias("day_of_week"),
        (F.col("ts").cast("double") <= F.col("mid")).alias("__is_ref"),
    )
    dims = ["event_type", "hour_of_day", "day_of_week"]
    return root_cause_report(
        base.filter("__is_ref").drop("__is_ref"),
        base.filter(~F.col("__is_ref")).drop("__is_ref"),
        dims,
        top_k=5,
    )


@query(
    "x12_null_matrix",
    """
    WITH u AS (
      SELECT source, 'lang' AS col,
             (CASE WHEN lang IS NULL OR trim(lang) = ''
                   THEN 1 ELSE 0 END) AS miss
      FROM documents
      UNION ALL
      SELECT source, 'text',
             CASE WHEN text IS NULL OR trim(text) = ''
                  THEN 1 ELSE 0 END
      FROM documents
      UNION ALL
      SELECT source, 'n_chars',
             CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END
      FROM documents
    )
    SELECT source, col, count(*)::BIGINT AS n,
           sum(miss)::BIGINT AS missing,
           round(sum(miss)::DOUBLE / count(*), 6) AS miss_rate
    FROM u GROUP BY source, col ORDER BY source, col
    """,
)
def x12_null_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — per-source completeness matrix (round 7): missing-value
    rate (NULL or blank) for every column × source cell — the "which
    feed broke which field" heatmap that localizes what
    ``x12_quality_constraints``' global rates can only detect and
    ``x12_source_profile_drift`` sees only as a mean shift. ONE
    stack-unpivot scan (the ``x12_layout_advisor`` pattern): columns
    unpivot plan-side, so N columns cost one pass, not N."""
    d = _t(spark, sf_dir, "documents")

    def miss(c, blankable):
        e = F.col(c).isNull()
        if blankable:
            e = e | (F.trim(F.col(c)) == "")
        return e.cast("int")

    stacked = d.select(
        "source",
        F.explode(
            F.array(
                F.struct(
                    F.lit("lang").alias("col"),
                    miss("lang", True).alias("miss"),
                ),
                F.struct(
                    F.lit("text").alias("col"),
                    miss("text", True).alias("miss"),
                ),
                F.struct(
                    F.lit("n_chars").alias("col"),
                    miss("n_chars", False).alias("miss"),
                ),
            )
        ).alias("r"),
    ).select("source", "r.col", "r.miss")
    return (
        stacked.groupBy("source", "col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("miss").cast("long").alias("missing"),
            F.round(F.sum("miss") / F.count(F.lit(1)), 6).alias(
                "miss_rate"
            ),
        )
        .orderBy("source", "col")
    )


@query(
    "x12_benford",
    """
    WITH d AS (
      SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                         AS VARCHAR), 1, 1)::INT AS digit
      FROM orders WHERE o_totalprice >= 0.01
    ),
    c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n)::DOUBLE AS tot FROM c)
    SELECT digit, n,
           round(n / t.tot, 6) AS obs_share,
           round(log10(1 + 1.0 / digit), 6) AS exp_share,
           round(n / t.tot - log10(1 + 1.0 / digit), 6) AS dev
    FROM c, t ORDER BY digit
    """,
)
def x12_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — Benford first-significant-digit audit of order totals
    (round 7): naturally-occurring multi-scale amounts follow
    P(d) = log10(1+1/d); a fabricated or truncated feed doesn't — the
    classic forensic screen, here as a warehouse data-quality monitor
    next to ``x12_quality_constraints``. The first digit is read from
    the integer-cents STRING (round-to-cents is engine-exact, where a
    floor(log10) path flips digits when an engine's log10 lands an ULP
    under an integer). One filtered scan folds to ≤ 9 count cells;
    everything after is arithmetic on the 9-row frame
    (operators/validation.py:benford_audit). Full oracle."""
    from vectordb_migrator_spark.operators.validation import benford_audit

    return benford_audit(_t(spark, sf_dir, "orders"), "o_totalprice")


@query(
    "x12_quality_constraints",
    """
    WITH m AS (
      SELECT round(count(o_orderkey)::DOUBLE / count(*), 6) AS nn,
             round(count(DISTINCT o_orderkey)::DOUBLE
                   / count(o_orderkey), 6) AS uq,
             round(sum(CASE WHEN o_totalprice IS NOT NULL
                             AND o_totalprice BETWEEN 0 AND 1000000
                            THEN 1 ELSE 0 END)::DOUBLE
                   / count(o_totalprice), 6) AS rng,
             round(sum(CASE WHEN o_orderpriority SIMILAR TO '[0-9]-[A-Z ]+'
                            THEN 1 ELSE 0 END)::DOUBLE
                   / count(o_orderpriority), 6) AS pat,
             round(count(*)::DOUBLE, 6) AS n
      FROM orders
    )
    SELECT * FROM (
      SELECT 'not_null_o_orderkey' AS check_name, nn AS value,
             1.0::DOUBLE AS threshold, nn >= 1.0 AS passed FROM m
      UNION ALL
      SELECT 'unique_o_orderkey', uq, 1.0::DOUBLE, uq >= 1.0 FROM m
      UNION ALL
      SELECT 'in_range_o_totalprice', rng, 1.0::DOUBLE, rng >= 1.0 FROM m
      UNION ALL
      SELECT 'matches_o_orderpriority', pat, 1.0::DOUBLE, pat >= 1.0 FROM m
      UNION ALL
      SELECT 'min_rows', n, 100.0::DOUBLE, n >= 100.0 FROM m
    ) ORDER BY check_name
    """,
)
def x12_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — declarative data-quality gate (the deequ niche): five
    constraints — key non-null + unique, price range, priority format,
    row floor — ALL evaluated in one aggregate over one scan; the
    verdict frame unpivots from the single report row plan-side."""
    from vectordb_migrator_spark.operators.validation import (
        check_constraints,
        in_range,
        matches,
        min_rows,
        not_null,
        unique,
    )

    return check_constraints(
        _t(spark, sf_dir, "orders"),
        [
            not_null("o_orderkey"),
            unique("o_orderkey"),
            in_range("o_totalprice", 0, 1_000_000),
            matches("o_orderpriority", r"^[0-9]-[A-Z ]+$"),
            min_rows(100),
        ],
    ).orderBy("check_name")


@query(
    "x0_retrieval_tfidf",
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
    ), dims AS (SELECT i FROM range(1, 17) t(i)),
    dfs AS (
      SELECT i, sum(CASE WHEN e.v[i] > 0 THEN 1 ELSE 0 END)::DOUBLE AS dfv
      FROM emb e, dims GROUP BY i
    ),
    nn AS (SELECT count(*)::DOUBLE AS n FROM emb),
    idf AS (
      SELECT list(ln((nn.n + 1) / (dfv + 1)) + 1 ORDER BY i) AS ia
      FROM dfs, nn GROUP BY nn.n
    ),
    wemb AS (
      SELECT doc_id, chunk_id,
             [v[i] * ia[i] for i in range(1, 17)] AS wv
      FROM emb, idf
    ),
    pb AS (
      SELECT {_FHB_SQL.format(col="text")} AS bks
      FROM documents WHERE doc_id = 0
    ), praw AS (
      SELECT {_FHV_SQL.format(bks="bks")} AS pv FROM pb
    ), p AS (
      SELECT [pv[i] * ia[i] for i in range(1, 17)] AS wpv FROM praw, idf
    )
    SELECT doc_id, chunk_id,
           round(list_dot_product(wv, wpv) /
                 (sqrt(list_dot_product(wv, wv)) *
                  sqrt(list_dot_product(wpv, wpv))), 6) AS score
    FROM wemb, p
    ORDER BY score DESC, doc_id, chunk_id LIMIT 10
    """,
)
def x0_retrieval_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — TF-IDF-weighted hashed retrieval: the corpus-statistics
    upgrade of x0_retrieval_pipeline. Per-dimension document
    frequencies reduce to ONE 17-column aggregate row over the chunk
    vectors; the smoothed idf array broadcasts back (1-row cross
    join) and reweights chunk and probe vectors alike — common
    buckets stop dominating the cosine. Cost shape: TWO chunk+embed
    passes over the corpus (the stats pass and the score pass — the
    honest minimum for a corpus-statistics model, same as the
    surprisal operators; persist the chunk-vector frame to pay it
    once when reused), then TakeOrdered. Fully value-hash-verified
    thanks to the md5 bucket hashing."""
    from vectordb_migrator_spark.functions.text import feature_hash_vector
    from vectordb_migrator_spark.functions.vector import cosine_similarity
    from vectordb_migrator_spark.operators.chunking import chunk_text
    from vectordb_migrator_spark.operators.util import fan_out

    dim = 16
    docs = fan_out(_t(spark, sf_dir, "documents"))
    probe_tf = [
        float(x)
        for x in docs.filter(F.col("doc_id") == 0)
        .select(feature_hash_vector("text", dim=dim).alias("v"))
        .first()["v"]
    ]
    emb = chunk_text(docs, chunk_size=32, overlap=8).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        feature_hash_vector("chunk_text", dim=dim).alias("v"),
    )
    stats = emb.agg(
        F.count("*").cast("double").alias("n"),
        *[
            F.sum((F.col("v")[i] > 0).cast("long")).cast("double").alias(f"df{i}")
            for i in range(dim)
        ],
    ).select(
        F.array(
            *[
                F.log((F.col("n") + 1) / (F.col(f"df{i}") + 1)) + 1
                for i in range(dim)
            ]
        ).alias("ia")
    )
    weighted = (
        emb.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "chunk_id",
            F.zip_with("v", "ia", lambda a, b: a * b).alias("wv"),
            F.array(*[F.lit(x) for x in probe_tf]).alias("pv_tf"),
            "ia",
        )
        .withColumn("wpv", F.zip_with("pv_tf", "ia", lambda a, b: a * b))
    )
    return (
        weighted.select(
            "doc_id",
            "chunk_id",
            F.round(cosine_similarity("wv", "wpv"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id", "chunk_id")
        .limit(10)
    )


@query("x2_decontaminate", None)  # oracle attached below (computed string)
def x2_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — embedding-level benchmark decontamination: (train, eval)
    pairs above cosine 0.25, LSH-bucket-blocked with the eval side
    broadcast — the train corpus is one scan with a map-side probe.
    Eval set = every 17th embedding (a stand-in benchmark); train =
    the rest."""
    from vectordb_migrator_spark.operators.dedup import embedding_cross_near_dup

    e = _t(spark, sf_dir, "embeddings")
    train = e.filter(F.col("vec_id") % 17 != 0)
    ev = e.filter(F.col("vec_id") % 17 == 0)
    return embedding_cross_near_dup(train, ev, _PLANES, threshold=0.25).orderBy(
        "train_id", "eval_id"
    )


ORACLES["x2_decontaminate"] = f"""
    WITH n AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                           embedding::DOUBLE[]))) AS v,
             {_plane_sig_sql('embedding::DOUBLE[]')} AS sig
      FROM embeddings
    )
    SELECT t.vec_id AS train_id, e.vec_id AS eval_id,
           round(list_dot_product(t.v, e.v), 6) AS cos
    FROM n t JOIN n e ON t.sig = e.sig
    WHERE t.vec_id % 17 != 0 AND e.vec_id % 17 = 0
      AND list_dot_product(t.v, e.v) >= 0.25
    ORDER BY train_id, eval_id
    """


@query(
    "x5_bigram_surprisal",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    bgx AS (
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
      FROM t, unnest(range(1, len(toks))) r(i)
      WHERE len(toks) >= 2
    ),
    counts AS (SELECT bg, count(*)::BIGINT AS c FROM bgx GROUP BY bg),
    model AS (SELECT bg, c FROM counts ORDER BY c DESC, bg LIMIT 2000),
    ctx AS (
      SELECT w1, ctx_c FROM (
        SELECT string_split(bg, ' ')[1] AS w1, sum(c)::BIGINT AS ctx_c
        FROM counts GROUP BY 1)
      ORDER BY ctx_c DESC, w1 LIMIT 2000
    ),
    stats AS (
      SELECT least(count(*), 2000)::DOUBLE AS n_vocab FROM counts
    )
    SELECT b.doc_id,
           round(avg(-log2((coalesce(m.c, 0) + 0.5) /
                           (coalesce(x.ctx_c, 0) + 0.5 * (s.n_vocab + 1)))),
                 6) AS surprisal,
           count(*)::BIGINT AS n_big
    FROM bgx b
    LEFT JOIN model m USING (bg)
    LEFT JOIN ctx x ON x.w1 = string_split(b.bg, ' ')[1],
         stats s
    GROUP BY b.doc_id ORDER BY b.doc_id
    """,
)
def x5_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — per-document bigram surprisal under a bounded corpus
    bigram LM (top-2000 bigrams + top-2000 contexts, additive
    smoothing): the transition-aware perplexity-filter step up from
    ``x5_unigram_surprisal``. Bigrams form in codegen (token array
    zipped with its shift — no positional join); ONE bigram-count
    shuffle feeds model, contexts, and stats."""
    from vectordb_migrator_spark.operators.cleaning import bigram_surprisal

    return bigram_surprisal(
        _t(spark, sf_dir, "documents"), model_size=2000
    ).orderBy("doc_id")


@query(
    "x10_mixture_apply",
    r"""
    WITH per AS (
      SELECT source, count(*)::DOUBLE AS size FROM documents GROUP BY source
    ),
    d AS (SELECT sum(pow(size, 0.5)) AS denom FROM per),
    mix AS (
      SELECT source,
             round(round(round(pow(size, 0.5) / denom, 6) * 800.0, 2)
                   / size, 6) AS epochs
      FROM per, d
    ),
    c AS (
      SELECT doc.doc_id, doc.source, mix.epochs, u.copy
      FROM documents doc JOIN mix USING (source),
           unnest(range(1, greatest(1, ceil(mix.epochs))::BIGINT + 1)) u(copy)
      WHERE mix.epochs > 0
    )
    SELECT doc_id, source, copy
    FROM c
    WHERE copy <= floor(epochs)
       OR CAST(CONCAT('0x', substr(md5(concat_ws(':', doc_id, copy, 42)), 1, 8))
               AS BIGINT) / 4294967296.0 < epochs - floor(epochs)
    ORDER BY doc_id, copy
    """,
)
def x10_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — materialized temperature resampling: floor(epochs) full
    copies per row plus a deterministic md5-coin fractional copy —
    up- AND down-sampling in one narrow explode, no shuffle, and
    bit-reproducible across engines (hence the full value-hash
    oracle, impossible with rand())."""
    from vectordb_migrator_spark.operators.slicing import (
        apply_source_mixture,
        source_mixture,
    )

    docs = _t(spark, sf_dir, "documents")
    mix = source_mixture(docs, source_col="source", alpha=0.5, budget=800)
    return (
        apply_source_mixture(
            docs.select("doc_id", "source"), mix, id_col="doc_id", seed=42
        )
        .select("doc_id", "source", "copy")
        .orderBy("doc_id", "copy")
    )


@query(
    "x1_dup_rate_by_lang",
    """
    SELECT lang,
           count(*)::BIGINT AS n_docs,
           (count(*) - count(DISTINCT md5(text)))::BIGINT AS n_dup_rows,
           round((count(*) - count(DISTINCT md5(text)))::DOUBLE
                 / count(*), 6) AS dup_rate
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def x1_dup_rate_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — exact-duplication rate per LANGUAGE (round 5): the
    language-axis sibling of ``x1_dup_rate_by_source`` — a language
    whose dup rate spikes usually means one dominant syndicated feed
    in that language, and its mixture weight should be read net of
    duplicates. One map-side-combinable aggregate."""
    from vectordb_migrator_spark.functions.text import md5_fingerprint

    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (F.count(F.lit(1)) - F.countDistinct(F.md5("text")))
            .cast("long")
            .alias("n_dup_rows"),
            F.round(
                (F.count(F.lit(1)) - F.countDistinct(F.md5("text")))
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("lang")
    )


@query(
    "x0_curriculum_order",
    r"""
    WITH s AS (
      SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT
               AS n_tok,
             CAST(CONCAT('0x', substr(md5(concat('cur:', doc_id)), 1, 15))
                  AS BIGINT) AS key
      FROM documents
    )
    SELECT doc_id, n_tok,
           (row_number() OVER (ORDER BY n_tok DESC, key, doc_id) - 1)::BIGINT
             AS position
    FROM s ORDER BY doc_id
    """,
)
def x0_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — deterministic CURRICULUM order (round 5): documents ranked
    by a quality signal (token count here; any score plugs in) with an
    md5 key breaking ties pseudo-randomly-but-reproducibly — the
    quality-first ordering of curriculum learning, byte-stable across
    runs so two training jobs see the identical sequence. The exact
    small-N variant carries the oracle; at 100 TB the order key sorts
    WITHIN shards (compose with ``deterministic_shuffle``) instead of
    asking for a total order — same trade as ``x5_quality_tiers``."""
    from pyspark.sql import Window as W

    from vectordb_migrator_spark.functions.text import token_count_ws

    key = F.conv(
        F.substring(F.md5(F.concat(F.lit("cur:"), F.col("doc_id"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        token_count_ws("text").cast("long").alias("n_tok"),
        key.alias("__key"),
    )
    w = W.orderBy(F.desc("n_tok"), "__key", "doc_id")
    return (
        d.withColumn("position", (F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "n_tok", "position")
        .orderBy("doc_id")
    )


@query(
    "x10_temperature_sweep",
    r"""
    WITH per AS (
      SELECT source, count(*)::DOUBLE AS size FROM documents GROUP BY source
    ),
    d AS (
      SELECT sum(pow(size, 0.2)) AS d02, sum(pow(size, 0.5)) AS d05,
             sum(pow(size, 0.8)) AS d08, sum(size) AS d10
      FROM per
    )
    SELECT source, size::BIGINT AS n,
           round(pow(size, 0.2) / d02, 6) AS w_a02,
           round(pow(size, 0.5) / d05, 6) AS w_a05,
           round(pow(size, 0.8) / d08, 6) AS w_a08,
           round(size / d10, 6) AS w_a10
    FROM per, d ORDER BY source
    """,
)
def x10_temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — temperature SWEEP (round 5): each source's mixture weight
    at alpha ∈ {0.2, 0.5, 0.8, 1.0} side by side — the table that
    picks the temperature (alpha→0 flattens toward uniform, alpha=1
    is proportional; the spread between columns shows how much any
    alpha choice moves each source). ONE per-source aggregate + a
    broadcast 1-row normalizer frame; the tuning-table sibling of the
    threshold sweep and the S-curve."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("size")
    )
    d = per.agg(
        *[
            F.sum(F.pow("size", F.lit(a))).alias(f"d{tag}")
            for a, tag in ((0.2, "02"), (0.5, "05"), (0.8, "08"), (1.0, "10"))
        ]
    )
    return (
        per.crossJoin(F.broadcast(d))
        .select(
            "source",
            F.col("size").cast("long").alias("n"),
            *[
                F.round(
                    F.pow("size", F.lit(a)) / F.col(f"d{tag}"), 6
                ).alias(f"w_a{tag}")
                for a, tag in (
                    (0.2, "02"),
                    (0.5, "05"),
                    (0.8, "08"),
                    (1.0, "10"),
                )
            ],
        )
        .orderBy("source")
    )


@query("x10_lang_balanced_mixture", None)  # oracle attached below (computed)
def x10_lang_balanced_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — language-balanced resampling (round 5): the multilingual-LM
    recipe end to end — PREDICTED language (the ``x5_langid`` stopword
    argmax, no ground-truth labels needed) becomes the mixture axis,
    alpha=0.3 exponent-smoothed weights (the XLM-R setting) up-weight
    rare languages, and the deterministic md5-coin materializes the
    draw. Pure composition of engine components; the langid is codegen,
    the mixture frame is tiny and broadcast, the replication is a
    narrow explode — one corpus scan for the apply."""
    from vectordb_migrator_spark.functions.text import lang_id
    from vectordb_migrator_spark.operators.slicing import (
        apply_source_mixture,
        source_mixture,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", lang_id("text").alias("lang_pred")
    )
    mix = source_mixture(docs, source_col="lang_pred", alpha=0.3, budget=800)
    return (
        apply_source_mixture(
            docs, mix, source_col="lang_pred", id_col="doc_id", seed=7
        )
        .select("doc_id", "lang_pred", "copy")
        .orderBy("doc_id", "copy")
    )


def _lang_mixture_sql() -> str:
    return rf"""
    WITH dl AS (
      SELECT doc_id, {_langid_case_sql()} AS lang_pred FROM documents
    ),
    per AS (
      SELECT lang_pred, count(*)::DOUBLE AS size FROM dl GROUP BY lang_pred
    ),
    d AS (SELECT sum(pow(size, 0.3)) AS denom FROM per),
    mix AS (
      SELECT lang_pred,
             round(round(round(pow(size, 0.3) / denom, 6) * 800.0, 2)
                   / size, 6) AS epochs
      FROM per, d
    ),
    c AS (
      SELECT dl.doc_id, dl.lang_pred, mix.epochs, u.copy
      FROM dl JOIN mix USING (lang_pred),
           unnest(range(1, greatest(1, ceil(mix.epochs))::BIGINT + 1)) u(copy)
      WHERE mix.epochs > 0
    )
    SELECT doc_id, lang_pred, copy
    FROM c
    WHERE copy <= floor(epochs)
       OR CAST(CONCAT('0x', substr(md5(concat_ws(':', doc_id, copy, 7)), 1, 8))
               AS BIGINT) / 4294967296.0 < epochs - floor(epochs)
    ORDER BY doc_id, copy
    """


ORACLES["x10_lang_balanced_mixture"] = _lang_mixture_sql()


def _curation_report_sql() -> str:
    return rf"""
    WITH per AS (
      SELECT source, {_langid_case_sql()} AS lang_pred,
             len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT
               AS n_tok,
             md5(text) AS h
      FROM documents
    ),
    grain AS (
      SELECT source, lang_pred,
             floor(log2(greatest(n_tok, 1)))::BIGINT AS bucket,
             count(*)::DOUBLE AS n,
             sum(n_tok)::DOUBLE AS tok,
             count(DISTINCT h)::DOUBLE AS dist,
             sum(CASE WHEN n_tok >= 20 THEN 1.0 ELSE 0.0 END) AS passed
      FROM per
      GROUP BY source, lang_pred, floor(log2(greatest(n_tok, 1)))
    ),
    src AS (
      SELECT source, sum(n) AS n, sum(tok) AS tok, sum(dist) AS dist,
             sum(passed) AS passed
      FROM grain GROUP BY source
    ),
    d AS (
      SELECT sum(pow(n, 0.3)) AS d03, sum(pow(n, 0.7)) AS d07,
             sum(n) AS all_n, sum(tok) AS all_tok
      FROM src
    ),
    lang AS (SELECT lang_pred, sum(tok) AS tok FROM grain GROUP BY lang_pred),
    hist AS (SELECT bucket, sum(n) AS n FROM grain GROUP BY bucket)
    SELECT * FROM (
      SELECT 'mixture@0.3' AS section, source AS k,
             round(pow(n, 0.3) / d03, 6) AS v FROM src, d
      UNION ALL
      SELECT 'mixture@0.7', source, round(pow(n, 0.7) / d07, 6) FROM src, d
      UNION ALL
      SELECT 'lang_tokens', lang_pred, round(tok / all_tok, 6) FROM lang, d
      UNION ALL
      SELECT 'len_hist', bucket::VARCHAR, round(n, 6) FROM hist
      UNION ALL
      SELECT 'dup_by_source', source, round(1.0 - dist / n, 6) FROM src
      UNION ALL
      SELECT 'quality_by_source', source, round(passed / n, 6) FROM src
      UNION ALL
      SELECT 'totals', 'docs', round(all_n, 6) FROM d
      UNION ALL
      SELECT 'totals', 'tokens', round(all_tok, 6) FROM d
    ) ORDER BY section, k
    """


@query("x0_curation_report", None)  # oracle attached below (computed)
def x0_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — the composed one-pass CURATION REPORT (round 6): the
    artifact a scheduled 100 TB run actually logs, folding the
    standing diagnostic sweeps into ONE corpus scan. Per-doc signals
    (predicted language, whitespace token count, exact-dup md5, the
    simple quality gate) aggregate into a (source, lang, log2-length
    bucket) GRAIN rollup — a few hundred rows — which is
    ``localCheckpoint``-ed; every published table then derives from
    the tiny rollup without touching the corpus again:

    - ``mixture@α`` (α ∈ {0.3, 0.7}): temperature-smoothed per-source
      weights (the x10 sweep's shape),
    - ``lang_tokens``: per-language token share (the mixture axis),
    - ``len_hist``: docs per power-of-two length bucket,
    - ``dup_by_source``: within-source exact-dup rate (an identical
      text always lands in the same grain, so per-grain distinct
      counts SUM correctly per source),
    - ``quality_by_source``: gate pass rate,
    - ``totals``: corpus docs/tokens.

    Long (section, k, v) format so one frame carries every table. The
    standalone sweeps remain for interactive tuning; this is the
    scheduled composition (plan-locked: the returned plan contains NO
    parquet re-scan — all branches read the checkpointed grain).
    ``curation_ingest``/``curation_report_over`` are the streaming
    twin: per-batch grain partials (HLL dup sketches) accumulate in a
    kilobyte store and the same sections derive without any rescan."""
    from vectordb_migrator_spark.operators.cleaning import (
        curation_grain,
        curation_sections,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    docs = _t(spark, sf_dir, "documents")
    # fan_out: langid + md5 + tokenization are CPU-bound per-row work
    # and the toy single-file scan is 1-partition (no-op on a cluster)
    grain = curation_grain(fan_out(docs)).localCheckpoint(eager=True)
    return curation_sections(grain)


ORACLES["x0_curation_report"] = _curation_report_sql()


def _opq_adc_recall_sql() -> str:
    return f"""
    WITH dims AS (SELECT unnest(range(1, 65)) AS i),
    dimvar AS (
      SELECT i, var_pop(embedding[i]) AS vr
      FROM embeddings, dims GROUP BY i
    ),
    ranked AS (
      SELECT i AS dim,
             row_number() OVER (ORDER BY round(vr, 9) DESC, i) AS r
      FROM dimvar
    ),
    serp AS (
      SELECT dim,
             CASE WHEN (((r-1)//4) % 2) = 0 THEN (r-1)%4
                  ELSE 3 - ((r-1)%4) END AS s
      FROM ranked
    ),
    permt AS (SELECT list(dim ORDER BY s, dim) AS p FROM serp),
    p AS (SELECT {_PROBE_SQL} AS pv),
    pp AS (
      SELECT [p.pv[pt.p[j]] for j in range(1, 65)] AS pv FROM p, permt pt
    ),
    base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             [embedding[pt.p[j]]::DOUBLE for j in range(1, 65)] AS w
      FROM embeddings, permt pt
    ),
    cb AS (SELECT vec_id AS j, v AS cv, w AS pcv FROM base WHERE vec_id < 16),
    truth AS (
      SELECT vec_id FROM (
        SELECT e.vec_id,
               round(list_dot_product(e.v, p.pv) /
                     (sqrt(list_dot_product(e.v, e.v)) *
                      sqrt(list_dot_product(p.pv, p.pv))), 6) AS score
        FROM base e, p
      ) ORDER BY score DESC, vec_id LIMIT 10
    ),
    d_id AS (
      SELECT e.vec_id, (t.i-1) // 16 AS s, c.j,
             sum((e.v[t.i] - c.cv[t.i]) * (e.v[t.i] - c.cv[t.i])) AS dist
      FROM base e, range(1, 65) t(i), cb c
      GROUP BY e.vec_id, (t.i-1) // 16, c.j
    ),
    code_id AS (
      SELECT vec_id, s, j FROM (
        SELECT vec_id, s, j,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist, j) AS rn
        FROM d_id
      ) WHERE rn = 1
    ),
    lut_id AS (
      SELECT (t.i-1) // 16 AS s, c.j,
             sum((p.pv[t.i] - c.cv[t.i]) * (p.pv[t.i] - c.cv[t.i])) AS pd
      FROM cb c, p, range(1, 65) t(i)
      GROUP BY (t.i-1) // 16, c.j
    ),
    adc_id AS (
      SELECT code_id.vec_id, round(sum(lut_id.pd), 6) AS adc_dist
      FROM code_id JOIN lut_id
        ON lut_id.s = code_id.s AND lut_id.j = code_id.j
      GROUP BY code_id.vec_id
      ORDER BY adc_dist, code_id.vec_id LIMIT 10
    ),
    d_pm AS (
      SELECT e.vec_id, (t.i-1) // 16 AS s, c.j,
             sum((e.w[t.i] - c.pcv[t.i]) * (e.w[t.i] - c.pcv[t.i])) AS dist
      FROM base e, range(1, 65) t(i), cb c
      GROUP BY e.vec_id, (t.i-1) // 16, c.j
    ),
    code_pm AS (
      SELECT vec_id, s, j FROM (
        SELECT vec_id, s, j,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist, j) AS rn
        FROM d_pm
      ) WHERE rn = 1
    ),
    lut_pm AS (
      SELECT (t.i-1) // 16 AS s, c.j,
             sum((pp.pv[t.i] - c.pcv[t.i]) * (pp.pv[t.i] - c.pcv[t.i])) AS pd
      FROM cb c, pp, range(1, 65) t(i)
      GROUP BY (t.i-1) // 16, c.j
    ),
    adc_pm AS (
      SELECT code_pm.vec_id, round(sum(lut_pm.pd), 6) AS adc_dist
      FROM code_pm JOIN lut_pm
        ON lut_pm.s = code_pm.s AND lut_pm.j = code_pm.j
      GROUP BY code_pm.vec_id
      ORDER BY adc_dist, code_pm.vec_id LIMIT 10
    )
    SELECT layout, hits, round(hits / 10.0, 6) AS recall_at_10 FROM (
      SELECT 'fitted' AS layout, count(*)::BIGINT AS hits
      FROM adc_pm JOIN truth USING (vec_id)
      UNION ALL
      SELECT 'identity', count(*)::BIGINT
      FROM adc_id JOIN truth USING (vec_id)
    ) ORDER BY layout
    """


@query("x4_opq_adc_recall", None)  # oracle attached below (computed)
def x4_opq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — OPQ fit feeding the RETRIEVAL path (round 6): recall@10 of
    PQ-ADC top-10 against the exact cosine top-10, under the identity
    subspace layout and the variance-balanced fitted permutation
    (:func:`opq_balanced_permutation`, same fit as
    ``x9_opq_fit_error``) — the end-to-end answer to "does the
    re-layout help retrieval, not just reconstruction error". Probe,
    codebook seeds, AND corpus all permute together (an orthogonal
    transform preserves every exact distance, so the truth set is
    layout-independent); only the PQ approximation changes. Full
    oracle: DuckDB refits the same permutation from the same parquet
    and replays both ADC pipelines. Scale shape: the ADC scans are
    LUT-lookups + TakeOrdered (no vector math per row beyond encode),
    the fit is one posexplode variance aggregate.

    Honest reading: the fixture embeddings are near-isotropic (unit
    random), so per-dim variances are nearly equal and the fitted
    layout ties identity within top-k noise — the report's job is to
    MEASURE that. On real encoder outputs (PCA-skewed variance mass)
    the balanced layout is where OPQ's gains live; this query is the
    gauge you run to find out."""
    from vectordb_migrator_spark.operators.similarity import (
        cosine_topk,
        opq_balanced_permutation,
        pq_adc_topk,
        pq_sampled_codebooks,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    emb = _t(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    var_rows = (
        fan_out(emb.select(v.alias("__va")))
        .select(F.posexplode("__va").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.var_pop("val").alias("vr"))
        .collect()
    )
    variances = [0.0] * 64
    for r in var_rows:
        variances[r["pos"]] = float(r["vr"])
    perm = opq_balanced_permutation(variances, 4)
    cbs = pq_sampled_codebooks(emb, m=4, k=16)
    flat = [[cbs[d // 16][j][d % 16] for d in range(64)] for j in range(16)]
    perm_books = [
        [[flat[j][perm[i]] for i in range(s * 16, s * 16 + 16)] for j in range(16)]
        for s in range(4)
    ]
    pprobe = [probe[perm[i]] for i in range(64)]
    pv = F.array(*[v.getItem(perm[i]) for i in range(64)])
    embp = emb.select("vec_id", pv.alias("__pv"))
    truth = cosine_topk(emb, probe, k=10).select("vec_id")
    adc_id = pq_adc_topk(emb, probe, cbs, k=10).select("vec_id")
    adc_fit = pq_adc_topk(embp, pprobe, perm_books, k=10, vec_col="__pv").select(
        "vec_id"
    )

    def rec(df, tag):
        return (
            df.join(truth, "vec_id")
            .agg(F.count(F.lit(1)).cast("long").alias("hits"))
            .select(F.lit(tag).alias("layout"), "hits")
        )

    return (
        rec(adc_fit, "fitted")
        .unionAll(rec(adc_id, "identity"))
        .select(
            "layout",
            "hits",
            F.round(F.col("hits") / 10.0, 6).alias("recall_at_10"),
        )
        .orderBy("layout")
    )


ORACLES["x4_opq_adc_recall"] = _opq_adc_recall_sql()


@query("x9_pca_evr", None)  # rows-only: no SQL engine has an eigensolver
def x9_pca_evr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — PCA explained-variance curve (round 6): top-8 principal
    components' variance, ratio, and cumulative ratio — the sizing
    gauge behind every "can we truncate to d' dims" decision
    (Matryoshka cuts, OPQ rotations, PQ subspace budgets). The fit is
    the distributed Gram-matrix partial-reduce
    (:func:`~vectordb_migrator_spark.operators.decomposition
    .gram_matrix`: one BLAS ``XᵀX`` per Arrow batch, one d×d partial
    per batch to the driver — O(batches·d²) movement, never N·d²)
    plus a driver-side eigendecomposition with a deterministic sign
    convention. Rows-only (no SQL eigensolver exists); the NumPy
    differential in tests/test_decomposition.py is the oracle."""
    from vectordb_migrator_spark.operators.decomposition import (
        gram_matrix,
        pca_fit,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    emb = _t(spark, sf_dir, "embeddings")
    gram, colsum, n = gram_matrix(fan_out(emb))
    _, ev = pca_fit(gram, colsum, n)
    total = float(ev.sum())
    rows = [
        (
            i,
            round(float(ev[i]), 6),
            round(float(ev[i] / total), 6),
            round(float(ev[: i + 1].sum() / total), 6),
        )
        for i in range(8)
    ]
    return spark.createDataFrame(
        rows, "component int, variance double, evr double, cum_evr double"
    )


@query("x9_opq_rotation_error", None)  # rows-only: eigensolver-dependent
def x9_opq_rotation_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — TRUE OPQ initialization (round 6): per-subspace PQ
    reconstruction error under the PCA ROTATION (the standard OPQ warm
    start — a learned orthogonal transform, not just a permutation)
    side by side with identity. Completes the ladder the x9 family
    climbs: seeded permutation (premise) → variance-balanced
    permutation (cheap fit) → PCA rotation (dense fit). The corpus
    rotates once via the Arrow-batched matmul
    (:func:`~vectordb_migrator_spark.operators.decomposition
    .rotate_vectors`); the rotated codebook seeds are rotated
    DRIVER-side (16 matvecs) rather than filtering the rotated frame —
    ``mapInPandas`` blocks predicate pushdown, so a post-rotation
    filter would rotate the whole corpus to fetch 16 rows. Both
    layouts' folds read projected slice columns (the lambda-inlining
    guard). Rows-only; the NumPy differential replays the entire
    pipeline (tests/test_decomposition.py)."""
    import numpy as np_

    from vectordb_migrator_spark.operators.decomposition import (
        gram_matrix,
        pca_fit,
        rotate_vectors,
    )
    from vectordb_migrator_spark.operators.similarity import (
        pq_sampled_codebooks,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    emb = _t(spark, sf_dir, "embeddings")
    gram, colsum, n = gram_matrix(fan_out(emb))
    comps, _ = pca_fit(gram, colsum, n)
    cbs = pq_sampled_codebooks(emb, m=4, k=16)
    flat = np_.array(
        [[cbs[d // 16][j][d % 16] for d in range(64)] for j in range(16)]
    )
    flat_rot = flat @ comps.T
    rot_books = [
        [[float(flat_rot[j][i]) for i in range(s * 16, s * 16 + 16)]
         for j in range(16)]
        for s in range(4)
    ]
    rot = rotate_vectors(emb.select("embedding"), comps, out_col="__rv")
    v = F.col("embedding").cast("array<double>")
    sliced = rot.select(
        *[F.slice(v, s * 16 + 1, 16).alias(f"__id{s}") for s in range(4)],
        *[F.slice("__rv", s * 16 + 1, 16).alias(f"__rt{s}") for s in range(4)],
    )

    def sub_errs(prefix, books, tag):
        out = []
        for s in range(4):
            sub = F.col(f"{prefix}{s}")
            cands = F.array(
                *[F.array(*[F.lit(float(x)) for x in cw]) for cw in books[s]]
            )
            dists = F.transform(
                cands,
                lambda c: F.aggregate(
                    F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
            out.append(
                F.struct(
                    F.lit(s).cast("int").alias("s"),
                    F.lit(tag).alias("layout"),
                    F.array_min(dists).alias("mdist"),
                )
            )
        return out

    rows_ = sub_errs("__id", cbs, "identity") + sub_errs(
        "__rt", rot_books, "rotated"
    )
    exploded = sliced.select(F.explode(F.array(*rows_)).alias("e")).select(
        "e.s", "e.layout", "e.mdist"
    )
    return (
        exploded.groupBy("layout", "s")
        .agg(
            F.round(F.avg("mdist"), 6).alias("mse_mean"),
            F.round(F.max("mdist"), 6).alias("mse_max"),
        )
        .orderBy("layout", "s")
    )
