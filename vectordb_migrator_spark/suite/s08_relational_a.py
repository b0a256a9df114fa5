"""Registry family ``s08_relational_a`` — split from the monolithic
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
    asof_join,
    cosine_topk,
    pd,
    query,
    session_stats,
)



# =====================================================================
# Relational extensions — rollup/pivot/percentiles/set-ops/semi-anti,
# as-of join, sessionization (all absent from the reference, SURVEY.md
# §2.8; first-class for a training-data pipeline)
# =====================================================================


@query(
    "rollup_pricing",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
           count(*)::BIGINT AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — one pass, Spark expands grouping sets
    in the partial aggregate (no extra scan per level)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double").alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_qty",
            "n",
        )
        .orderBy("rf", "ls")
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_counts",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) FILTER (event_type = 'click')::BIGINT    AS click,
           count(*) FILTER (event_type = 'error')::BIGINT    AS error,
           count(*) FILTER (event_type = 'purchase')::BIGINT AS purchase,
           count(*) FILTER (event_type = 'signup')::BIGINT   AS signup,
           count(*) FILTER (event_type = 'view')::BIGINT     AS view
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot day × event_type → one count column per type. Explicit
    value list ⇒ single-pass pivoted aggregate (no distinct-values
    pre-scan, which at 100 TB would be a second full read)."""
    ev = _t(spark, sf_dir, "events")
    p = (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in _EVENT_TYPES],
    ).orderBy("day")


@query(
    "percentile_event_values",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.9), 4)  AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def percentile_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). The scale path is ``approx_percentile`` (KLL-ish
    mergeable sketch, x7-style); exact is kept where the oracle needs
    bit-equality."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


@query(
    "histogram_event_values",
    """
    SELECT least(floor(value / 50.0), 9)::BIGINT AS bucket,
           count(*)::BIGINT AS n,
           sum(value::DECIMAL(18,2))::DOUBLE AS total
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (bucket = value/50, top-clamped): the
    one-pass distribution profile — bucketing is a pure projection, so
    the aggregate is map-side partial like any groupBy."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.least(F.floor(F.col("value") / 50.0), F.lit(9))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("bucket")
    )


@query(
    "cube_order_status_priority",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)::BIGINT AS n,
           sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all four grouping sets expanded
    in ONE partial aggregate pass (the rollup_pricing companion
    covering the full lattice, not just the hierarchy)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@query(
    "setops_nations",
    """
    SELECT 'intersect' AS op, k::BIGINT AS nationkey FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
      INTERSECT
      SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)
    UNION ALL
    SELECT 'except', k::BIGINT FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
      EXCEPT
      SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)
    ORDER BY op, nationkey
    """,
)
def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT — distinct set semantics; Spark plans both as
    aggregate + join on the full row, one exchange each."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("k"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("k"))
    )
    inter = c.intersect(s).select(F.lit("intersect").alias("op"), F.col("k").cast("long").alias("nationkey"))
    # subtract = EXCEPT (set semantics); exceptAll would leave the
    # left side's surplus duplicates alive through a later distinct
    exc = c.subtract(s).select(
        F.lit("except").alias("op"), F.col("k").cast("long").alias("nationkey")
    )
    return inter.unionAll(exc).orderBy("op", "nationkey")


@query(
    "semi_anti_urgent",
    """
    SELECT 'semi' AS op, c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'anti', c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    ORDER BY op, c_custkey
    """,
)
def semi_anti_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi / left-anti joins (EXISTS / NOT EXISTS) — the filtered
    orders side is aggregated to distinct keys by the semi-join itself;
    no payload duplication."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("c_custkey"))
    semi = c.join(urgent, "c_custkey", "left_semi").select(
        F.lit("semi").alias("op"), "c_custkey"
    )
    anti = c.join(urgent, "c_custkey", "left_anti").select(
        F.lit("anti").alias("op"), "c_custkey"
    )
    return semi.unionAll(anti).orderBy("op", "c_custkey")


@query(
    "q18_large_orders",
    """
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice AS totalprice,
           sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY 1 HAVING sum(l_quantity) > 300)
    GROUP BY 1, 2, 3, 4
    ORDER BY totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg-derived key set applied as a LEFT SEMI join
    on lineitem (ids only — no subquery rescan), customer broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double").alias("sum_qty")
        )
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "asof_purchase_click",
    """
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           floor((epoch_us(p.ts) - epoch_us(c.ts)) / 1000000)::BIGINT
             AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks): each purchase matched to the
    user's most recent click at-or-before it. union + one hash exchange
    on user_id + running last() — never a per-key cross product."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    j = asof_join(purchases, clicks, "user_id", right_cols=[])
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.floor(
            (F.unix_micros("ts") - F.unix_micros("ts_r")) / F.lit(1_000_000)
        ).cast("long").alias("gap_s"),
    ).orderBy("event_id")


@query(
    "sessionize_events",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 43200000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessioned AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           count(*)::BIGINT AS n_events,
           floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000)::BIGINT
             AS duration_s
    FROM sessioned GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (12 h gap): lag + running sum, one
    exchange on user_id; the session rollup reuses that partitioning."""
    ev = _t(spark, sf_dir, "events")
    stats = session_stats(
        ev,
        "user_id",
        "ts",
        gap_micros=43_200_000_000,
        tiebreak_cols=["event_id"],
    )
    return stats.select(
        "user_id",
        F.col("session_id").cast("long"),
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        "n_events",
        "duration_s",
    ).orderBy("user_id", "session_id")


@query(
    "x8_session_window_batch",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessioned AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           count(*)::BIGINT AS n_events
    FROM sessioned GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def x8_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 — ``F.session_window`` on the batch table (Spark's unified
    model: identical code runs incrementally on a stream with a
    watermark; see streaming/stateful.py). Oracle = gap-and-island SQL
    with the same half-open [first, last+gap) semantics."""
    from vectordb_migrator_spark.streaming.stateful import session_window_stats

    ev = _t(spark, sf_dir, "events")
    s = session_window_stats(ev, gap="30 minutes")
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
        "n_events",
    ).orderBy("user_id", "session_start")


@query(
    "x9_chunk_documents",
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
    )
    , x AS (
      SELECT doc_id,
             unnest([{'chunk_id': i - 1,
                      'chunk_text': array_to_string(
                        toks[(i-1)*24 + 1 : (i-1)*24 + 32], ' '),
                      'n_tokens': least(n - (i-1)*24, 32)}
                     for i in range(1, n_chunks + 1)]) AS ch
      FROM c)
    SELECT doc_id, ch.chunk_id::BIGINT AS chunk_id,
           ch.chunk_text AS chunk_text,
           ch.n_tokens::BIGINT AS n_tokens
    FROM x ORDER BY doc_id, chunk_id
    """,
)
def x9_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — overlapping token-window chunking (chunk 32, overlap 8):
    the pre-embedding segmentation step; narrow stage, no shuffle."""
    from vectordb_migrator_spark.operators.chunking import chunk_text

    d = _t(spark, sf_dir, "documents")
    return chunk_text(d, chunk_size=32, overlap=8).orderBy("doc_id", "chunk_id")


def _nf4_literals() -> tuple[str, str]:
    """(mids, levels) as SQL list literals — repr round-trips the
    doubles exactly, so both engines compare identical bits."""
    from vectordb_migrator_spark.functions.vector import (
        _NF4_MIDS,
        NF4_LEVELS,
    )

    mids = "[" + ", ".join(repr(m) for m in _NF4_MIDS) + "]"
    levels = "[" + ", ".join(repr(v) for v in NF4_LEVELS) + "]"
    return mids, levels


def _nf4_sql() -> str:
    """Oracle for x9_nf4_quantization: the same midpoint-threshold
    nearest-level search over the same double literals."""
    mids, levels = _nf4_literals()
    return f"""
    WITH q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
               AS scale
      FROM embeddings
    ), c AS (
      SELECT vec_id, v, scale,
             CASE WHEN scale = 0 THEN list_transform(v, x -> 7)
                  ELSE list_transform(v, x ->
                    len(list_filter({mids}, m -> x / scale > m))::INT)
             END AS q
      FROM q
    )
    SELECT vec_id, round(scale, 6) AS scale,
           array_to_string(q, ',') AS q,
           round(CASE WHEN scale = 0 THEN 0.0 ELSE
             list_max([abs(v[i] - {levels}[q[i] + 1] * scale)
                       for i in range(1, len(v) + 1)]) END, 6) AS max_err
    FROM c ORDER BY vec_id"""


@query("x9_nf4_quantization", _nf4_sql())
def x9_nf4_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — NF4 4-bit quantization of the embedding column (QLoRA's
    NormalFloat codebook: equal-mass N(0,1) quantiles rescaled to
    [-1,1]) + max reconstruction error — the storage tier below int8
    (8× vs float32) for roughly-normal embedding values. Nearest-level
    search is 15 midpoint comparisons in pure codegen (ties snap to
    the lower level — deterministic first-argmin in every engine);
    zero vectors code to the 0.0 level at scale 0. Full oracle over
    identical double literals."""
    from vectordb_migrator_spark.functions.vector import (
        nf4_dequantize,
        nf4_quantize,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    # fan_out below the projection: 64 elements × 15 midpoint
    # comparisons per row is CPU-heavy codegen, and the one-row-group
    # local scan would single-thread it (the simhash lesson)
    e = fan_out(_t(spark, sf_dir, "embeddings"))
    qs = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        nf4_quantize("embedding").alias("qs"),
    )
    return qs.select(
        "vec_id",
        F.round(F.col("qs.scale"), 6).alias("scale"),
        F.array_join(
            F.transform(F.col("qs.q"), lambda x: x.cast("string")), ","
        ).alias("q"),
        F.round(
            F.aggregate(
                F.zip_with(
                    "v", nf4_dequantize("qs"), lambda x, y: F.abs(x - y)
                ),
                F.lit(0.0),
                lambda s, x: F.greatest(s, x),
            ),
            6,
        ).alias("max_err"),
    ).orderBy("vec_id")


def _nf4_recall_sql() -> str:
    """Oracle for x4_nf4_recall: exact float top-10 vs top-10 over
    NF4-dequantized vectors (asymmetric — the probe stays float)."""
    mids, levels = _nf4_literals()
    return f"""
    WITH p AS (SELECT {{probe}} AS pv),
    truth AS (
      SELECT vec_id
      FROM embeddings, p
      ORDER BY round(list_dot_product(embedding::DOUBLE[], pv) /
                 (sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) *
                  sqrt(list_dot_product(pv, pv))), 6) DESC, vec_id
      LIMIT 10
    ),
    q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
               AS scale
      FROM embeddings
    ),
    dq AS (
      SELECT vec_id,
             CASE WHEN scale = 0
                  THEN list_transform(v, x -> 0.0)
                  ELSE list_transform(v, x ->
                    {levels}[len(list_filter({mids},
                        m -> x / scale > m)) + 1] * scale)
             END AS d
      FROM q
    ),
    approx AS (
      SELECT dq.vec_id
      FROM dq, p
      ORDER BY round(list_dot_product(d, pv) /
                 (sqrt(list_dot_product(d, d)) *
                  sqrt(list_dot_product(pv, pv))), 6) DESC, dq.vec_id
      LIMIT 10
    )
    SELECT 10::BIGINT AS k, count(*)::BIGINT AS n_hits,
           round(count(*) / 10.0, 6) AS recall
    FROM truth JOIN approx USING (vec_id)"""


@query("x4_nf4_recall", None)  # oracle bound below (needs the probe)
def x4_nf4_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — NF4 in the retrieval path (round 7): recall@10 of
    brute-force cosine over the NF4-DEQUANTIZED corpus against the
    exact float truth, asymmetric (the probe stays float — the
    standard compressed-corpus serving layout). The 8× storage cut of
    ``x9_nf4_quantization`` is only worth taking if this number holds;
    this query is the gate. Both rankings are
    TakeOrderedAndProject(k), the dequantized scan is pure codegen,
    and the recall join is k-row-sized. Full oracle (same codebook
    literals)."""
    from vectordb_migrator_spark.functions.vector import (
        nf4_dequantize,
        nf4_quantize,
    )
    from vectordb_migrator_spark.operators.similarity import cosine_topk
    from vectordb_migrator_spark.operators.util import fan_out

    probe = _probe_vector(spark, sf_dir)
    e = fan_out(_t(spark, sf_dir, "embeddings"))
    truth = cosine_topk(e, probe, k=10).select("vec_id")
    dq = e.select(
        "vec_id", nf4_dequantize(nf4_quantize("embedding")).alias("embedding")
    )
    approx = cosine_topk(dq, probe, k=10).select("vec_id")
    return truth.join(approx, "vec_id").agg(
        F.lit(10).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.round(F.count(F.lit(1)) / F.lit(10.0), 6).alias("recall"),
    )


def _bind_nf4_recall_oracle() -> None:
    # the probe literal matches _PROBE_SQL (same vec_id-0 convention
    # used by every other recall oracle)
    ORACLES["x4_nf4_recall"] = _nf4_recall_sql().format(probe=_PROBE_SQL)


_bind_nf4_recall_oracle()


@query(
    "x9_int8_quantization",
    """
    WITH q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
               AS scale
      FROM embeddings
    )
    SELECT vec_id, round(scale, 6) AS scale,
           array_to_string(
             CASE WHEN scale = 0 THEN list_transform(v, x -> 0::INT)
                  ELSE list_transform(v, x -> round(x / scale)::INT) END,
             ',') AS q,
           round(CASE WHEN scale = 0 THEN 0.0 ELSE
             list_max([abs(v[i] - round(v[i] / scale) * scale)
                       for i in range(1, len(v) + 1)]) END, 6) AS max_err
    FROM q ORDER BY vec_id
    """,
)
def x9_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — symmetric int8 scalar quantization of the embedding column
    + max reconstruction error (bounded by scale/2). 4 bytes/dim → 1:
    the storage/bandwidth play for a 100 TB embedding corpus."""
    from vectordb_migrator_spark.functions.vector import (
        int8_dequantize,
        int8_quantize,
    )

    e = _t(spark, sf_dir, "embeddings")
    qs = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        int8_quantize("embedding").alias("qs"),
    )
    return qs.select(
        "vec_id",
        F.round(F.col("qs.scale"), 6).alias("scale"),
        # serialized, not a bare array<int>: the driver's pandas canon
        # cannot sort list cells (unhashable) — see module docstring
        F.array_join(
            F.transform(F.col("qs.q"), lambda x: x.cast("string")), ","
        ).alias("q"),
        F.round(
            F.aggregate(
                F.zip_with(
                    "v", int8_dequantize("qs"), lambda x, y: F.abs(x - y)
                ),
                F.lit(0.0),
                lambda s, x: F.greatest(s, x),
            ),
            6,
        ).alias("max_err"),
    ).orderBy("vec_id")


@query(
    "x9_embedding_pool",
    """
    WITH per AS (
      SELECT label, i,
             sum(embedding[i]::DECIMAL(25,10)) AS s,
             count(*) AS n,
             max(embedding[i]::DOUBLE) AS mx
      FROM embeddings, range(1, 65) t(i)
      GROUP BY label, i
    )
    SELECT label::BIGINT AS label,
           array_to_string(list(round(s::DOUBLE / n, 6)::DECIMAL(12,6)::VARCHAR
                                ORDER BY i), ',') AS mean_vec,
           array_to_string(list(round(mx, 6)::DECIMAL(12,6)::VARCHAR
                                ORDER BY i), ',') AS max_vec
    FROM per GROUP BY label ORDER BY label
    """,
)
def x9_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — chunk→document pooling: elementwise mean AND max vectors
    per group in ONE shuffle (collect_list + codegen zip_with folds).
    The mean sums through a fixed-scale decimal accumulator, so the
    result is bit-stable under any partitioning/reduction order — the
    oracle reproduces it exactly, no ulp tolerance needed (contrast
    x3_label_centroids' rounded double avg)."""
    from vectordb_migrator_spark.operators.pooling import pool_vectors

    e = _t(spark, sf_dir, "embeddings")
    pooled = pool_vectors(
        e, group_col="label", vec_col="embedding", modes=("mean", "max")
    )

    def ser(c):
        return F.array_join(
            F.transform(
                c, lambda v: F.round(v, 6).cast("decimal(12,6)").cast("string")
            ),
            ",",
        )

    return pooled.select(
        F.col("label").cast("long").alias("label"),
        ser(F.col("mean_vec")).alias("mean_vec"),
        ser(F.col("max_vec")).alias("max_vec"),
    ).orderBy("label")


@query(
    "x9_chunk_feature_pool",
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
             unnest([{'chunk_text': array_to_string(
                        toks[(i-1)*24 + 1 : (i-1)*24 + 32], ' '),
                      'n_tokens': least(n - (i-1)*24, 32)}
                     for i in range(1, n_chunks + 1)]) AS ch
      FROM c
    ), feats AS (
      SELECT doc_id,
             ch.n_tokens::DOUBLE AS f1,
             length(ch.chunk_text)::DOUBLE AS f2,
             length(regexp_replace(ch.chunk_text, '[^.,;:!?]', '', 'g'))::DOUBLE
               AS f3,
             length(regexp_replace(ch.chunk_text, '[^0-9]', '', 'g'))::DOUBLE
               AS f4
      FROM x
    )
    SELECT doc_id,
           array_to_string([
             round(sum(f1::DECIMAL(25,10))::DOUBLE / count(*), 6)
               ::DECIMAL(12,6)::VARCHAR,
             round(sum(f2::DECIMAL(25,10))::DOUBLE / count(*), 6)
               ::DECIMAL(12,6)::VARCHAR,
             round(sum(f3::DECIMAL(25,10))::DOUBLE / count(*), 6)
               ::DECIMAL(12,6)::VARCHAR,
             round(sum(f4::DECIMAL(25,10))::DOUBLE / count(*), 6)
               ::DECIMAL(12,6)::VARCHAR
           ], ',') AS mean_vec
    FROM feats GROUP BY doc_id ORDER BY doc_id
    """,
)
def x9_chunk_feature_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — the full chunk pipeline end-to-end: chunk (narrow, no
    shuffle) → per-chunk feature vector (codegen) → mean-pool back to
    one vector per document (ONE shuffle, decimal-exact). The shape a
    real chunk-embed-pool pipeline compiles to, with features standing
    in for the (stubbed) embedding model."""
    from vectordb_migrator_spark.operators.chunking import chunk_text
    from vectordb_migrator_spark.operators.pooling import pool_vectors

    d = _t(spark, sf_dir, "documents")
    chunks = chunk_text(d, chunk_size=32, overlap=8)
    feats = chunks.select(
        "doc_id",
        F.array(
            F.col("n_tokens").cast("double"),
            F.length("chunk_text").cast("double"),
            F.length(F.regexp_replace("chunk_text", r"[^.,;:!?]", "")).cast(
                "double"
            ),
            F.length(F.regexp_replace("chunk_text", r"[^0-9]", "")).cast("double"),
        ).alias("feat"),
    )
    pooled = pool_vectors(feats, group_col="doc_id", vec_col="feat", modes="mean")
    return pooled.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.col("mean_vec"),
                lambda v: F.round(v, 6).cast("decimal(12,6)").cast("string"),
            ),
            ",",
        ).alias("mean_vec"),
    ).orderBy("doc_id")


@query(
    "x9_pack_chunks",
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
                      'n_tokens': least(n - (i-1)*24, 32)}
                     for i in range(1, n_chunks + 1)]) AS ch
      FROM c
    ), ch AS (
      SELECT doc_id, ch.chunk_id::BIGINT AS chunk_id,
             ch.n_tokens::BIGINT AS n_tokens
      FROM x
    ), off AS (
      SELECT doc_id, chunk_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY doc_id ORDER BY chunk_id)
               - n_tokens AS o
      FROM ch
    )
    SELECT doc_id, chunk_id, n_tokens,
           (o // 64)::BIGINT AS pack_id,
           (o % 64)::BIGINT AS pack_offset
    FROM off ORDER BY doc_id, chunk_id
    """,
)
def x9_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — sequence packing: chunks fill fixed 64-token bins by
    running offset (one window cumsum per doc — sessionization-shaped,
    single exchange)."""
    from vectordb_migrator_spark.operators.chunking import chunk_text, pack_chunks

    d = _t(spark, sf_dir, "documents")
    packed = pack_chunks(chunk_text(d, chunk_size=32, overlap=8), budget=64)
    return packed.select(
        "doc_id", "chunk_id", "n_tokens", "pack_id", "pack_offset"
    ).orderBy("doc_id", "chunk_id")


@query(
    "x2_lsh_plan",
    """
    WITH cfg AS (
      SELECT b, 64 // b AS r FROM unnest([1, 2, 4, 8, 16, 32, 64]) t(b)
    ),
    g AS (SELECT (i::DOUBLE + 0.5) / 200 AS s
          FROM unnest(range(0, 200)) t(i)),
    cell AS (
      SELECT cfg.b, cfg.r, g.s,
             1 - pow(1 - pow(g.s, cfg.r), cfg.b) AS p
      FROM cfg CROSS JOIN g
    ),
    agg AS (
      SELECT b, r,
             round(sum(CASE WHEN s < 0.5 THEN p ELSE 0 END) / 200, 6)
               AS fp_area,
             round(sum(CASE WHEN s >= 0.5 THEN 1 - p ELSE 0 END) / 200,
                   6) AS fn_area
      FROM cell GROUP BY b, r
    ),
    best AS (
      SELECT min(round(fp_area + fn_area, 6)) AS c FROM agg
    )
    SELECT b::INT AS bands, r::INT AS rows_per_band, fp_area, fn_area,
           round(fp_area + fn_area, 6) AS cost,
           (round(fp_area + fn_area, 6) = best.c) AS chosen
    FROM agg, best ORDER BY bands
    """,
)
def x2_lsh_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — LSH band-plan auto-tuner (round 7): for a 64-hash
    signature budget and target threshold 0.5, integrate the S-curve's
    false-positive area below the threshold and false-negative area
    above it (200-point midpoint grid) for every (bands, rows)
    factorization, and flag the cost-minimizing plan — the knob
    chooser that turns ``x2_lsh_s_curve``'s eyeball table into a
    decision. Pure generated math, zero corpus scan; full oracle."""
    cfg = spark.createDataFrame(
        [(b, 64 // b) for b in (1, 2, 4, 8, 16, 32, 64)], "b int, r int"
    )
    g = spark.range(0, 200).select(
        ((F.col("id") + 0.5) / 200).alias("s")
    )
    cell = cfg.crossJoin(g).withColumn(
        "p", 1 - F.pow(1 - F.pow(F.col("s"), F.col("r")), F.col("b"))
    )
    agg = cell.groupBy("b", "r").agg(
        F.round(
            F.sum(F.when(F.col("s") < 0.5, F.col("p")).otherwise(0.0))
            / 200,
            6,
        ).alias("fp_area"),
        F.round(
            F.sum(
                F.when(F.col("s") >= 0.5, 1 - F.col("p")).otherwise(0.0)
            )
            / 200,
            6,
        ).alias("fn_area"),
    ).withColumn(
        "cost", F.round(F.col("fp_area") + F.col("fn_area"), 6)
    )
    from pyspark.sql import Window

    best = F.min("cost").over(Window.partitionBy())
    return (
        agg.withColumn("chosen", F.col("cost") == best)
        .select(
            F.col("b").alias("bands"),
            F.col("r").alias("rows_per_band"),
            "fp_area",
            "fn_area",
            "cost",
            "chosen",
        )
        .orderBy("bands")
    )


@query(
    "x2_lsh_s_curve",
    """
    WITH g AS (SELECT (i::DOUBLE) / 20 AS s
               FROM unnest(range(1, 20)) t(i)),
    c AS (
      SELECT s,
             round(1 - pow(1 - pow(s, 4), 4), 6) AS p_b4_r4,
             round(1 - pow(1 - pow(s, 2), 8), 6) AS p_b8_r2,
             round(1 - pow(1 - pow(s, 8), 2), 6) AS p_b2_r8
      FROM g
    )
    SELECT s, p_b4_r4, p_b8_r2, p_b2_r8,
           (p_b4_r4 >= 0.5) AS caught_b4_r4
    FROM c ORDER BY s
    """,
)
def x2_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — the MinHash-LSH S-curve (round 5): candidate-match
    probability 1-(1-s^r)^b as a function of Jaccard similarity for
    three banding configs over 16 hashes — the tuning table that picks
    (b, r) for a target threshold BEFORE running the corpus (b=8,r=2
    catches 0.5-similar pairs ~79% of the time; b=2,r=8 near-never —
    the knob the engine's banded families expose). Pure generated
    math, no corpus scan — the methodology is the artifact."""
    g = spark.range(1, 20).select((F.col("id") / 20).alias("s"))
    p = lambda b, r: F.round(
        1 - F.pow(1 - F.pow(F.col("s"), r), b), 6
    )
    return (
        g.select(
            "s",
            p(4, 4).alias("p_b4_r4"),
            p(8, 2).alias("p_b8_r2"),
            p(2, 8).alias("p_b2_r8"),
        )
        .withColumn("caught_b4_r4", F.col("p_b4_r4") >= 0.5)
        .orderBy("s")
    )


@query(
    "x0_interleaved_order",
    r"""
    WITH k AS (
      SELECT doc_id, source,
             CAST(CONCAT('0x', substr(md5(concat('il:', doc_id)), 1, 15))
                  AS BIGINT) AS key
      FROM documents
    ),
    r AS (
      SELECT doc_id, source,
             (row_number() OVER (PARTITION BY source ORDER BY key, doc_id)
              - 1)::BIGINT AS pos
      FROM k
    )
    SELECT doc_id, source, pos,
           (row_number() OVER (ORDER BY pos, source, doc_id) - 1)::BIGINT
             AS global_pos
    FROM r ORDER BY doc_id
    """,
)
def x0_interleaved_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — deterministic source-interleaved training order (round 5):
    each source is md5-shuffled internally, then sources round-robin by
    in-source position — maximal source mixing within the training
    stream (no source-run batches, the gradient-noise argument for
    interleaving) while staying byte-reproducible. Per-source windows
    are key-local; the global order key (pos, source) is computed —
    at 100 TB a trainer sorts WITHIN shards by it rather than asking
    for one total order (this exact small-N variant carries the
    oracle)."""
    from pyspark.sql import Window as W

    key = F.conv(
        F.substring(F.md5(F.concat(F.lit("il:"), F.col("doc_id"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", key.alias("__key")
    )
    wp = W.partitionBy("source").orderBy("__key", "doc_id")
    r = d.withColumn("pos", (F.row_number().over(wp) - 1).cast("long"))
    wg = W.orderBy("pos", "source", "doc_id")
    return (
        r.withColumn(
            "global_pos", (F.row_number().over(wg) - 1).cast("long")
        )
        .select("doc_id", "source", "pos", "global_pos")
        .orderBy("doc_id")
    )


def x0_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — rendezvous (highest-random-weight) sharding + reshard
    stability report (round 7): assign every doc to argmax_i
    md5(seed:id:i) over 8 shards, then RE-assign over 9 and measure
    per-shard movers — HRW's guarantee is that expanding N→N+1 moves
    only ~1/(N+1) of rows and every mover goes TO the new shard, so a
    100 TB layout grows without the ~50% reshuffle mod-N hashing
    causes. Assignment is pure codegen (n md5 scores per row, no
    shuffle); the report is one map-side-combinable rollup. Full
    oracle over identical md5/argmax math
    (operators/scale.py:rendezvous_assign)."""
    from vectordb_migrator_spark.operators.scale import rendezvous_assign

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    a = rendezvous_assign(docs, n_shards=8, out_col="shard")
    a = rendezvous_assign(a, n_shards=9, out_col="shard9")
    moved = F.sum(
        F.when(F.col("shard9") != F.col("shard"), 1).otherwise(0)
    ).cast("long")
    return (
        a.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            moved.alias("n_moved"),
            F.round(
                moved / F.count(F.lit(1)),
                6,
            ).alias("move_share"),
        )
        .orderBy("shard")
    )


ORACLES["x0_rendezvous_shards"] = """
    WITH s AS (
      SELECT doc_id,
        [CAST(CONCAT('0x', substr(md5('hrw:' || doc_id::VARCHAR || ':'
              || i::VARCHAR), 1, 15)) AS BIGINT)
         for i in range(0, 8)] AS sc8,
        [CAST(CONCAT('0x', substr(md5('hrw:' || doc_id::VARCHAR || ':'
              || i::VARCHAR), 1, 15)) AS BIGINT)
         for i in range(0, 9)] AS sc9
      FROM documents
    ), a AS (
      SELECT doc_id,
             (list_position(sc8, list_max(sc8)) - 1)::BIGINT AS shard,
             (list_position(sc9, list_max(sc9)) - 1)::BIGINT AS shard9
      FROM s
    )
    SELECT shard, count(*)::BIGINT AS n,
           sum(CASE WHEN shard9 != shard THEN 1 ELSE 0 END)::BIGINT
             AS n_moved,
           round(sum(CASE WHEN shard9 != shard THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS move_share
    FROM a GROUP BY shard ORDER BY shard
"""
QUERIES["x0_rendezvous_shards"] = x0_rendezvous_shards


@query(
    "x0_shard_shuffle",
    r"""
    WITH k AS (
      SELECT doc_id,
             CAST(CONCAT('0x', substr(md5(concat('shuffle:0:', doc_id)),
                                      1, 15)) AS BIGINT) AS key
      FROM documents
    ),
    s AS (
      SELECT doc_id, key, (((key % 8) + 8) % 8)::INT AS shard FROM k
    )
    SELECT doc_id, shard,
           (row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
            - 1)::BIGINT AS pos
    FROM s ORDER BY doc_id
    """,
)
def x0_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — deterministic shuffle-and-shard (round 5): a reproducible
    pseudo-random order key (md5 of seed:id) assigns every document a
    shard and an in-shard position — byte-identical layouts across
    runs, engines, and partitionings, which is what makes a training
    run resumable at "shard 5, position 40122" and two ablations
    comparable (rand() gives neither; hence the full cross-engine
    oracle). Key/shard are codegen; the one exchange is the balanced
    per-shard window. ``export_shards`` materializes this as
    shard-partitioned parquet + manifest."""
    from vectordb_migrator_spark.operators.scale import deterministic_shuffle

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return (
        deterministic_shuffle(docs, id_col="doc_id", n_shards=8, seed=0)
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    )


@query(
    "x0_packing_manifest",
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
                      'n_tokens': least(n - (i-1)*24, 32)}
                     for i in range(1, n_chunks + 1)]) AS ch
      FROM c
    ), ch AS (
      SELECT doc_id, ch.chunk_id::BIGINT AS chunk_id,
             ch.n_tokens::BIGINT AS n_tokens
      FROM x
    ), off AS (
      SELECT doc_id, chunk_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY doc_id ORDER BY chunk_id)
               - n_tokens AS o
      FROM ch
    ), packed AS (
      SELECT doc_id, chunk_id, n_tokens,
             (o // 64)::BIGINT AS pack_id, (o % 64)::BIGINT AS pack_offset
      FROM off
    )
    SELECT doc_id, pack_id,
           count(*)::BIGINT AS n_chunks,
           sum(n_tokens)::BIGINT AS n_tok,
           string_agg(chunk_id || ':' || pack_offset || ':' || n_tokens,
                      ',' ORDER BY chunk_id) AS spans
    FROM packed GROUP BY doc_id, pack_id
    ORDER BY doc_id, pack_id
    """,
)
def x0_packing_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — the sequence-packing MANIFEST (round 5): per packed
    training sequence, its chunk spans as ``chunk:offset:len`` triples
    in order — the cu_seqlens-style boundary artifact a trainer needs
    to build block-diagonal attention masks over packed sequences
    (without it, packing silently lets documents attend to each other).
    One window cumsum per doc + one (doc, pack) aggregate — the
    sessionization shape, two key-local exchanges, spans serialized to
    a string so the frame is plain columnar data."""
    from vectordb_migrator_spark.operators.chunking import chunk_text, pack_chunks

    d = _t(spark, sf_dir, "documents")
    packed = pack_chunks(chunk_text(d, chunk_size=32, overlap=8), budget=64)
    return (
        packed.groupBy("doc_id", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("n_tok"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("chunk_id", "pack_offset", "n_tokens")
                        )
                    ),
                    lambda s: F.concat_ws(
                        ":",
                        s.getField("chunk_id").cast("string"),
                        s.getField("pack_offset").cast("string"),
                        s.getField("n_tokens").cast("string"),
                    ),
                ),
            ).alias("spans"),
        )
        .orderBy("doc_id", "pack_id")
    )


@query(
    "x8_interval_join_batch",
    """
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS c_ts,
           c.event_id AS c_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
    ORDER BY p.event_id, c_event_id
    """,
)
def x8_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 — the stream-stream interval join's batch twin (Spark's
    unified model: the same operator runs incrementally with
    watermark-bounded state; runtime exercised in
    tests/test_streaming.py). Each purchase pairs with ALL clicks in
    its 30-minute lookback — attribution, not as-of."""
    from vectordb_migrator_spark.streaming.stateful import stream_interval_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = stream_interval_join(
        purchases, clicks, lookback="30 minutes", right_prefix="c_"
    )
    return j.select(
        "event_id",
        F.col("l.user_id").alias("user_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("c_ts"),
        "c_event_id",
    ).orderBy("event_id", "c_event_id")


@query(
    "udaf_weighted_avg",
    """
    SELECT l_returnflag,
           round(sum(l_quantity * l_linenumber) / sum(l_linenumber), 6)
             AS wavg_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF surface — grouped-agg pandas UDF (Arrow-batched, one call
    per group): weighted average over integral doubles so the oracle
    is reduction-order-exact. The scale path for custom aggregates the
    built-ins can't express."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(qty: pd.Series, weight: pd.Series) -> float:
        return float((qty * weight).sum() / weight.sum())

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_quantity", "l_linenumber"), 6).alias("wavg_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi join) on the synthetic
    schema: orders in a quarter having any large-quantity line. The
    lineitem side is filtered before the join so only matching
    orderkeys shuffle."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    big = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(big, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q12_priority_lines",
    """
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (conditional CASE aggregation over a join) on
    the synthetic schema; the date predicates reach the lineitem
    scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q14_promo_revenue",
    """
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                   THEN (l_extendedprice*(1-l_discount))::DECIMAL(18,4)
                   ELSE 0::DECIMAL(18,4) END) /
                 sum((l_extendedprice*(1-l_discount))::DECIMAL(18,4)), 6)::DOUBLE
             AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast the part dim, decimal sums for
    order-exactness, single global aggregate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.00) * F.sum(promo) / F.sum(rev), 6
            ).cast("double").alias("promo_revenue")
        )
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT sum((l_extendedprice * l_discount)::DECIMAL(18,4))::DOUBLE
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05::DOUBLE AND l_discount <= 0.07::DOUBLE
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side predicate aggregation — every
    filter pushes into the parquet scan, one global decimal sum, no
    shuffle beyond the final partial-merge."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue")
    )


@query(
    "q8_market_share",
    """
    WITH all_nations AS (
      SELECT extract(year FROM o_orderdate)::BIGINT AS o_year,
             (l_extendedprice * (1 - l_discount))::DECIMAL(18,4) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <= TIMESTAMP '1997-12-31'
    )
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_5' THEN volume
                          ELSE 0::DECIMAL(18,4) END) / sum(volume),
                 6)::DOUBLE AS mkt_share
    FROM all_nations GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the 8-table join tree.
    Dims (part, supplier, nation x2, region) broadcast; the fact chain
    lineitem→orders→customer shuffles on its join keys only. Decimal
    volume sums keep the share ratio order-exact."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                )
                / F.sum("volume"),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an extra join-time
    predicate (kept in the join condition, NOT a post-filter — a
    post-filter would turn the outer join inner and lose 0-order
    customers), then a two-level count distribution."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query("x10_hash_split")  # xxhash64 buckets — not DuckDB-expressible
def x10_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — deterministic hash-bucket train/test split (stable under
    re-runs and incremental appends, unlike sample())."""
    from vectordb_migrator_spark.operators.slicing import hash_split

    d = _t(spark, sf_dir, "documents")
    return (
        hash_split(d, id_col="doc_id", train_frac=0.9)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .orderBy("split")
    )


@query(
    "x10_per_group_head",
    """
    SELECT label::BIGINT AS label, vec_id FROM (
      SELECT label, vec_id,
             row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
      FROM embeddings)
    WHERE rn <= 5 ORDER BY label, vec_id
    """,
)
def x10_per_group_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — balanced per-class subset (first 5 per label): window
    row_number, one exchange on the class key."""
    from vectordb_migrator_spark.operators.slicing import per_group_head

    e = _t(spark, sf_dir, "embeddings")
    return (
        per_group_head(e, group_col="label", order_col="vec_id", n=5)
        .select(F.col("label").cast("long"), "vec_id")
        .orderBy("label", "vec_id")
    )


@query(
    "x10_stratified_sample",
    """
    SELECT label::BIGINT AS label, vec_id FROM (
      SELECT label, vec_id,
             row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn,
             count(*) OVER (PARTITION BY label) AS n
      FROM embeddings)
    WHERE rn <= ceil(n * 0.1) ORDER BY label, vec_id
    """,
)
def x10_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — exact stratified sample (10% per label, ceil'd so tiny
    strata never vanish — unlike Bernoulli sampleBy): one exchange on
    the stratum key serves both the size and rank windows."""
    from vectordb_migrator_spark.operators.slicing import stratified_sample

    e = _t(spark, sf_dir, "embeddings")
    return (
        stratified_sample(e, strata_col="label", frac=0.1, order_col="vec_id")
        .select(F.col("label").cast("long"), "vec_id")
        .orderBy("label", "vec_id")
    )


@query("x10_weighted_sample")  # xxhash64-derived randomness — no SQL oracle
def x10_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — Efraimidis–Spirakis weighted sampling without
    replacement, deterministic via hash-derived uniforms (rows-only
    check; inclusion-bias and determinism properties are asserted in
    tests). Weights = document length, so long docs are
    overrepresented — the quality-weighted subset pattern."""
    from vectordb_migrator_spark.operators.slicing import weighted_sample

    d = _t(spark, sf_dir, "documents")
    return (
        weighted_sample(
            d.withColumn("w", F.length("text").cast("double")),
            weight_col="w",
            k=50,
            id_col="doc_id",
        )
        .select("doc_id", F.col("w").cast("long").alias("text_len"))
        .orderBy("doc_id")
    )


@query(
    "x10_neyman_sample",
    """
    WITH st AS (
      SELECT source, count(*)::DOUBLE AS n_docs,
             round(stddev_pop(n_chars), 6) AS sd
      FROM documents GROUP BY source
    ), tot AS (
      SELECT sum(n_docs * sd) AS t FROM st
    ), alloc AS (
      SELECT source, n_docs::BIGINT AS n_docs, sd,
             floor(100 * round(n_docs * sd / t, 9) + 0.5)::BIGINT AS alloc
      FROM st, tot
    ), rk AS (
      SELECT d.source, d.doc_id,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY md5(d.doc_id::VARCHAR), d.doc_id)
               AS pick_rank
      FROM documents d
    )
    SELECT r.source, r.doc_id, r.pick_rank, a.alloc
    FROM rk r JOIN alloc a USING (source)
    WHERE r.pick_rank <= a.alloc
    ORDER BY r.source, r.pick_rank
    """,
)
def x10_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — Neyman-allocated stratified sample (round 7): the
    variance-optimal upgrade of ``x10_stratified_sample``'s
    proportional allocation — each source's share of the 100-doc
    budget is N_h·S_h / ΣN_h·S_h (S_h = length stddev), so
    high-variance strata get the rows that shrink the estimator
    variance most (Neyman 1934, the survey-sampling classic applied
    to corpus QA budgets: "which sources do I hand to human review").
    Constant-length strata get weight 0 and drop out. Selection is
    deterministic: rank within stratum by md5(doc_id) — a seeded
    shuffle both engines replay bit-identically. Scale shape: one
    grouped moment pass for the allocation (stratum-count-sized), one
    stratum-keyed rank window for the pick; at 100 TB swap the window
    for a per-partition local top-(max alloc) pre-filter and the sort
    touches only candidates. Stddev rounds to 6 and the weight to 9
    before the half-up floor, so the allocation is engine-exact."""
    d = _t(spark, sf_dir, "documents")
    st = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.round(F.stddev_pop("n_chars"), 6).alias("sd"),
    )
    tot = st.agg(F.sum(F.col("n_docs") * F.col("sd")).alias("t"))
    alloc = st.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        "sd",
        F.floor(
            F.lit(100)
            * F.round(F.col("n_docs") * F.col("sd") / F.col("t"), 9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("alloc"),
    )
    rk = d.select(
        "source",
        "doc_id",
        F.row_number()
        .over(
            W.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("pick_rank"),
    )
    return (
        rk.join(F.broadcast(alloc), "source")
        .filter(F.col("pick_rank") <= F.col("alloc"))
        .select("source", "doc_id", "pick_rank", "alloc")
        .orderBy("source", "pick_rank")
    )


@query(
    "udtf_json_props",
    """
    SELECT event_id, unnest(json_keys(props)) AS key,
           json_extract_string(props, '$.' || unnest(json_keys(props))) AS val
    FROM events ORDER BY event_id, key
    """,
)
def udtf_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props exploded to (key, val) rows. r13 opt (guide §4.1,
    r12-verdict #7): the round-8 Python UDTF (``LATERAL
    parse_props(props)``, per-row generator over ArrowEvalPython) is
    replaced by the built-in ``from_json(props, 'map<string,string>')``
    + ``explode`` — the whole transform now runs in JVM codegen with
    no Python boundary at all. Row-for-row identical by the data
    contract: every ``json.loads(props).items()`` pair equals the
    map's (key, value-as-string) entries (scalar JSON values
    stringify the same way), ``if props:`` matches from_json's
    NULL/empty → NULL map → explode-drops-it behavior, and the final
    (event_id, key) sort normalizes entry order. Oracle unchanged.
    ``fan_out`` parallelizes the parse+explode off the single-row-group
    local scan (measured 1.2 → 0.67 s warm; no-op on real corpora)."""
    from vectordb_migrator_spark.operators.util import fan_out

    m = F.from_json(F.col("props"), "map<string,string>")
    return (
        fan_out(_t(spark, sf_dir, "events"))
        .select("event_id", F.explode(m).alias("key", "val"))
        .orderBy("event_id", "key")
    )


@query(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           sum(o_totalprice::DECIMAL(18,2))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING)::DOUBLE AS running_total
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative windowed sum per key (decimal → order-exact): one
    exchange on the partition key, in-partition sort, O(1) state."""
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "timeseries_gap_fill",
    """
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
      FROM events
    ), hours AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour FROM b
    ), grid AS (
      SELECT hour, event_type FROM hours, (SELECT DISTINCT event_type FROM events)
    ), hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type, count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(g.hour, '%Y-%m-%d %H:00') AS hour, g.event_type,
           coalesce(h.n, 0)::BIGINT AS n
    FROM grid g LEFT JOIN hourly h USING (hour, event_type)
    ORDER BY hour, event_type
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample with zero-fill — silent hours become
    explicit 0 rows; grid construction is O(hours × keys) regardless
    of event volume."""
    from vectordb_migrator_spark.operators.timeseries import resample_fill_hourly

    ev = _t(spark, sf_dir, "events")
    out = resample_fill_hourly(ev)
    return out.select(
        F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
        "n",
    ).orderBy("hour", "event_type")


@query("x7_approx_percentile")  # sketch values differ across engines →
# rows-only; accuracy asserted in tests vs the exact percentile.
def x7_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — approx_percentile (mergeable quantile sketch): the scale
    path for percentile_event_values (exact interpolation needs a full
    sort per group; the sketch is one pass, mergeable, bounded
    memory)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.approx_percentile("value", F.lit(0.9), F.lit(10000)).alias("p90"),
        )
        .orderBy("event_type")
    )


@query("x4_brp_approx_join")  # seeded LSH buckets — not SQL-expressible;
# no-false-positives vs the exact distance asserted in tests.
def x4_brp_approx_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — MLlib BucketedRandomProjectionLSH approxSimilarityJoin:
    near-pairs under L2 distance via seeded random-projection buckets
    (SURVEY §2.8 X4's planned mapping). Deterministic (fixed seed);
    candidate generation is bucket-join-shaped like the custom LSH —
    MLlib manages the hash tables."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = (
        _t(spark, sf_dir, "embeddings")
        .limit(500)  # bounded candidate space for the gate
        .select(
            "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
        )
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    )
    model = brp.fit(e)
    pairs = model.approxSimilarityJoin(e, e, threshold=1.2, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("id_a"),
            F.col("datasetB.vec_id").alias("id_b"),
            F.round("dist", 6).alias("dist"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT sum((l_extendedprice*(1-l_discount))::DECIMAL(18,4))::DOUBLE
             AS revenue,
           count(*)::BIGINT AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    derives the per-side implied filters (brand/size on part, quantity
    on lineitem) and pushes them below the join — the classic
    disjunction-pushdown test."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        ).cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )


@query(
    "q22_idle_customers",
    """
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey::BIGINT AS nationkey, count(*)::BIGINT AS numcust,
           sum(c_acctbal::DECIMAL(18,2))::DOUBLE AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey ORDER BY nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (broadcast 1-row
    cross join) + NOT EXISTS anti join — above-average-balance
    customers with no urgent order, grouped by nation."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    return (
        rich.join(o, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double").alias("totacctbal"),
        )
        .select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "numcust",
            "totacctbal",
        )
        .orderBy("nationkey")
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           sum(volume)::DOUBLE AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate)::BIGINT AS l_year,
             ((l_extendedprice*(1-l_discount))::DECIMAL(18,4)) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_11')
          OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_6'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation pair over the full fact
    chain. Both nation copies broadcast; the OR-of-pairs filter prunes
    on the broadcasted dims before the fact shuffle; one exchange on
    the 3-column group key."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_11")
    ) | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_6"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).cast("double").alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           sum((l_extendedprice*(1-l_discount))::DECIMAL(18,4))::DOUBLE
             AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer. The
    orders⋈lineitem shuffle happens once on orderkey; customer and
    nation broadcast; top-20 via TakeOrderedAndProject (no global
    sort materialization)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).cast("double").alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             sum((l_extendedprice*(1-l_discount))::DECIMAL(18,4))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue::DOUBLE AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarter revenue per supplier, keep the max.
    The max is a 1-row broadcast cross join and the equality compare
    runs on the EXACT decimal sums (double only at output), so the
    winning supplier set is deterministic across engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT (sum(l_extendedprice::DECIMAL(18,2)) / 7.0)::DOUBLE
             AS avg_yearly,
           count(*)::BIGINT AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into one aggregate + broadcast join — the
    fact table is scanned twice but shuffled only as (partkey, avg)
    pairs; quantities are integral doubles so the 0.2*avg threshold is
    bit-exact across engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("q_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_q), li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("q_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate >= o_orderdate + INTERVAL 100 DAY
    )
    SELECT s_name, count(*)::BIGINT AS numwait
    FROM late l1
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late = shipped ≥100 days after the order date;
    the testdata has no commit/receipt dates): suppliers who were the
    ONLY late shipper on a multi-supplier failed order. EXISTS → left
    semi, NOT EXISTS → left anti, both on (orderkey, suppkey≠) — ids
    only through every shuffle, never payloads."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    base = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
