"""Registry family ``s07_sketches`` — split from the monolithic
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
    _t,
    query,
    token_count_ws,
)



# =====================================================================
# X7 — sketches
# =====================================================================


@query("x7_approx_distinct")  # HLL sketches differ across engines →
# rows-only check; exactness is asserted in tests vs countDistinct.
def x7_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — approx_count_distinct (HLL++): mergeable sketch, one pass,
    no exact-distinct shuffle."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "x7_cms_heavy_hitters",
    r"""
    WITH ev AS (SELECT user_id::VARCHAR AS k, user_id FROM events),
    cells AS (
      SELECT t.d,
             ((CAST(CONCAT('0x', substr(md5(concat('cms:', t.d, ':', k)),
                                        1, 15)) AS BIGINT) % 256) + 256)
               % 256 AS w,
             count(*)::BIGINT AS n
      FROM ev, unnest([0, 1, 2, 3]) t(d)
      GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT user_id, user_id::VARCHAR AS k FROM events),
    probes AS (
      SELECT user_id, t.d,
             ((CAST(CONCAT('0x', substr(md5(concat('cms:', t.d, ':', k)),
                                        1, 15)) AS BIGINT) % 256) + 256)
               % 256 AS w
      FROM keys, unnest([0, 1, 2, 3]) t(d)
    ),
    est AS (
      SELECT user_id, min(coalesce(c.n, 0))::BIGINT AS est
      FROM probes p LEFT JOIN cells c ON c.d = p.d AND c.w = p.w
      GROUP BY user_id
    ),
    ex AS (SELECT user_id, count(*)::BIGINT AS n_exact
           FROM events GROUP BY user_id)
    SELECT e.user_id, n_exact, est, (est - n_exact)::BIGINT AS overestimate
    FROM est e JOIN ex USING (user_id)
    ORDER BY est DESC, e.user_id LIMIT 10
    """,
)
def x7_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — count-min heavy hitters (round 6): per-user event
    frequencies estimated from an EXPLICIT (depth=4, width=256) CMS
    cell table (:func:`~vectordb_migrator_spark.operators.sketches
    .cms_build` / ``cms_estimate``) joined against exact counts — the
    top-10 report shows the CMS one-sided error (``overestimate`` ≥ 0
    always; nonzero where slots collide at this deliberately small
    width). Cells hash with md5, so the DuckDB oracle replays the
    identical cell math and the estimates match EXACTLY, collisions
    included. The store contract is the point: cells merge by
    addition, so per-batch partials answer like a monolithic build
    (``streaming.cms_ingest``). One scan builds the sketch (the
    exchange carries ≤ depth×width cells per partition); probes
    broadcast-join the kilobyte cell table."""
    from vectordb_migrator_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    ev = _t(spark, sf_dir, "events")
    cells = cms_build(ev, "user_id", depth=4, width=256)
    keys = ev.select("user_id").distinct()
    est = cms_estimate(cells, keys, "user_id", depth=4, width=256)
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "n_exact",
            "est",
            (F.col("est") - F.col("n_exact")).cast("long").alias("overestimate"),
        )
        .orderBy(F.desc("est"), "user_id")
        .limit(10)
    )


@query(
    "x7_histogram_quantiles",
    r"""
    WITH v AS (
      SELECT len(string_split_regex(lower(trim(text)), '\s+'))::DOUBLE
               AS val
      FROM documents
    ),
    h AS (
      SELECT floor(ln(val) / ln(1.05))::INT AS bucket, count(*)::BIGINT AS n
      FROM v WHERE val > 0 GROUP BY 1
    ),
    c AS (
      SELECT bucket, n, sum(n) OVER (ORDER BY bucket)::BIGINT AS cum FROM h
    ),
    t AS (SELECT sum(n)::BIGINT AS total FROM h),
    qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
    hit AS (
      SELECT q, min(bucket) AS bucket
      FROM qs, c, t WHERE c.cum >= ceil(q * t.total)
      GROUP BY q
    )
    SELECT q::DOUBLE AS q, round(pow(1.05, bucket + 1), 6) AS est
    FROM hit ORDER BY q
    """,
)
def x7_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — quantiles from the mergeable log-bucket histogram (round
    6): p50/p90/p99 of document token counts read off a geometric
    (base 1.05) bucket table (:func:`~vectordb_migrator_spark
    .operators.sketches.log_histogram` → ``histogram_quantiles``) —
    the t-digest-shaped answer with a PROVEN relative error bound
    (≤ 5% per bucket edge) and, unlike a t-digest, bucket counts that
    merge by plain addition (the streaming store's partial;
    ``streaming.histogram_ingest``). The histogram is
    localCheckpoint-ed so each quantile branch reads the tiny bucket
    table, not the corpus. Full oracle: the geometric bucketing is
    pure SQL, so DuckDB rebuilds the identical histogram and edges."""
    from vectordb_migrator_spark.functions.text import token_count_ws
    from vectordb_migrator_spark.operators.sketches import (
        histogram_quantiles,
        log_histogram,
    )

    docs = _t(spark, sf_dir, "documents").select(
        token_count_ws("text").cast("double").alias("val")
    )
    hist = log_histogram(docs, "val", base=1.05).localCheckpoint(eager=True)
    return histogram_quantiles(hist, [0.5, 0.9, 0.99], base=1.05).orderBy("q")


def _bloom_decontaminate_sql() -> str:
    pow2 = "[" + ", ".join(
        str((1 << b) if b < 63 else -(1 << 63)) for b in range(64)
    ) + "]"
    return rf"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(toks[i:i+4], ' ')
                                   for i in range(1, len(toks) - 3)])) AS gram
      FROM tok WHERE len(toks) >= 5
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0),
    p2 AS (SELECT {pow2} AS p),
    bpos AS (
      SELECT DISTINCT
             ((CAST(CONCAT('0x', substr(md5(concat('bloom:', t.i, ':',
                                                   gram)), 1, 15))
                    AS BIGINT) % 524288) + 524288) % 524288 AS pos
      FROM bench, unnest([0, 1, 2, 3]) t(i)
    ),
    wrd AS (
      SELECT (pos // 64)::INT AS word, bit_or(p[(pos % 64) + 1]) AS m
      FROM bpos, p2 GROUP BY 1
    ),
    mask AS (
      SELECT list(coalesce(wrd.m, 0) ORDER BY gs.word) AS mk
      FROM (SELECT unnest(range(0, 8192)) AS word) gs
      LEFT JOIN wrd USING (word)
    ),
    train AS (SELECT doc_id, gram FROM g WHERE doc_id % 17 != 0),
    ppos AS (
      SELECT doc_id, gram, t.i,
             ((CAST(CONCAT('0x', substr(md5(concat('bloom:', t.i, ':',
                                                   gram)), 1, 15))
                    AS BIGINT) % 524288) + 524288) % 524288 AS pos
      FROM train, unnest([0, 1, 2, 3]) t(i)
    ),
    gtest AS (
      SELECT doc_id, gram,
             bool_and((mk[(pos // 64) + 1] & p[(pos % 64) + 1]) != 0)
               AS inbloom
      FROM ppos, mask, p2 GROUP BY doc_id, gram
    ),
    flags AS (
      SELECT doc_id, bool_or(inbloom) AS bloom_hit FROM gtest GROUP BY doc_id
    ),
    ex AS (SELECT DISTINCT t.doc_id FROM train t JOIN bench b USING (gram)),
    alltrain AS (
      SELECT doc_id FROM tok WHERE len(toks) >= 5 AND doc_id % 17 != 0
    )
    SELECT a.doc_id,
           coalesce(f.bloom_hit, false) AS bloom_hit,
           (e.doc_id IS NOT NULL) AS exact_hit
    FROM alltrain a
    LEFT JOIN flags f USING (doc_id)
    LEFT JOIN ex e USING (doc_id)
    ORDER BY a.doc_id
    """


@query("x2_bloom_decontaminate", None)  # oracle attached below (computed)
def x2_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — Bloom-gated benchmark decontamination (round 6): the eval
    set's 5-gram vocabulary folds into a BROADCAST BITMASK
    (:func:`~vectordb_migrator_spark.operators.sketches.bloom_build`,
    2^19 bits, k=4) and the train corpus tests membership SCAN-SIDE
    (:func:`bloom_might_contain` — codegen bit tests, NO join on
    grams) next to the exact gram-join comparator. The report shows
    the Bloom contract per doc: ``bloom_hit`` is always true where
    ``exact_hit`` is (no false negatives — a clean doc is NEVER
    quarantined by mistake the other way), plus the false-positive
    rows this deliberately tight mask admits. Why bloom at 100 TB:
    the mask is O(bits) broadcast once — a 1-billion-gram benchmark
    fits ~1.5 GB of bits where the raw gram set is tens of GB and a
    join shuffles the corpus's grams; the gate then costs k hashes
    per gram in the scan. Production shape: bloom-gate first (cheap,
    superset), exact-join only the gated survivors. Full oracle: the
    md5 position math and mask words rebuild identically in DuckDB."""
    from vectordb_migrator_spark.operators.dedup import shingles
    from vectordb_migrator_spark.operators.sketches import (
        bloom_build,
        bloom_mask_frame,
        bloom_might_contain,
    )

    docs = _t(spark, sf_dir, "documents").filter(
        F.size(F.split(F.lower(F.trim("text")), r"\s+")) >= 5
    )
    grams = docs.select(
        "doc_id", F.explode(shingles("text", 5)).alias("gram")
    )
    bench = grams.filter(F.col("doc_id") % 17 == 0).select("gram").distinct()
    train = grams.filter(F.col("doc_id") % 17 != 0)
    mask = bloom_build(bench, "gram", n_bits=524288, k=4)
    mf = bloom_mask_frame(spark, mask)
    flags = (
        train.crossJoin(F.broadcast(mf))
        .select(
            "doc_id",
            bloom_might_contain(
                F.col("gram"), F.col("__bloom"), n_bits=524288, k=4
            ).alias("inbloom"),
        )
        .groupBy("doc_id")
        .agg(F.bool_or("inbloom").alias("bloom_hit"))
    )
    exact = (
        train.join(bench, "gram")
        .select("doc_id")
        .distinct()
        .withColumn("__e", F.lit(True))
    )
    alltrain = docs.filter(F.col("doc_id") % 17 != 0).select("doc_id")
    return (
        alltrain.join(flags, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("bloom_hit", F.lit(False)).alias("bloom_hit"),
            F.coalesce("__e", F.lit(False)).alias("exact_hit"),
        )
        .orderBy("doc_id")
    )


ORACLES["x2_bloom_decontaminate"] = _bloom_decontaminate_sql()


@query(
    "x7_group_quantiles",
    r"""
    WITH h AS (
      SELECT event_type, floor(ln(value) / ln(1.05))::INT AS bucket,
             count(*)::BIGINT AS n
      FROM events WHERE value > 0 GROUP BY event_type, 2
    ),
    c AS (
      SELECT event_type, bucket, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY bucket)::BIGINT
               AS cum
      FROM h
    ),
    t AS (
      SELECT event_type, sum(n)::BIGINT AS total FROM h GROUP BY event_type
    ),
    qs AS (SELECT unnest([0.5, 0.95]) AS q),
    hit AS (
      SELECT c.event_type, qs.q, min(bucket) AS bucket
      FROM qs, c JOIN t USING (event_type)
      WHERE c.cum >= ceil(qs.q * t.total)
      GROUP BY c.event_type, qs.q
    )
    SELECT event_type, q::DOUBLE AS q,
           round(pow(1.05, bucket + 1), 6) AS est
    FROM hit ORDER BY event_type, q
    """,
)
def x7_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — PER-GROUP quantiles from the log-bucket histogram (round
    6): p50/p95 of event value per event type, read off one grouped
    bucket table — the per-endpoint-latency / per-source-token-budget
    shape. The histogram is (n_groups × log-range) rows however big
    the event log, cumulative windows partition by group, and every
    estimate carries the same ≤ base−1 relative error bound. Same
    mergeable store contract as the global variant. Non-positive
    values are dropped scan-side (the operator's default policy —
    sf0.1 contains zero-valued events and a histogram must not abort
    the job on them; the oracle filters ``value > 0`` to match).
    Full oracle."""
    from vectordb_migrator_spark.operators.sketches import (
        histogram_quantiles,
        log_histogram,
    )

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    hist = log_histogram(
        ev, "value", base=1.05, group_cols=["event_type"]
    ).localCheckpoint(eager=True)
    return histogram_quantiles(
        hist, [0.5, 0.95], base=1.05, group_cols=["event_type"]
    ).orderBy("event_type", "q")


def x7_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — KMV distinct-user estimate per event type vs exact truth
    (round 7): the md5 k-minimum-values sketch (k=64) upgrades the
    distinct-count family from rows-only evidence (DataSketches HLL
    binaries) to a FULL value-hash oracle — (k−1)·2⁶⁰/v_k is
    reproducible in any engine with md5. The Spark side computes the
    k-min as a two-level mergeable reduce (per-salt partial k-mins of
    ≤ k longs each, then one flatten-sort-slice per group — bounded
    state by construction); the oracle takes the k-th smallest
    distinct hash directly. Groups under k distinct users report the
    exact count (the KMV contract). rel_err is the honesty column
    (σ/μ ≈ 1/√(k−2) ≈ 12.7%% at k=64)."""
    from vectordb_migrator_spark.operators.sketches import kmv_distinct

    ev = _t(spark, sf_dir, "events")
    est = kmv_distinct(ev, "user_id", group_cols=["event_type"], k=64)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_kmin",
            "est",
            "exact",
            F.round(
                F.abs(F.col("est") - F.col("exact")) / F.col("exact"), 6
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


ORACLES["x7_kmv_distinct"] = """
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(CONCAT('0x', substr(md5(user_id::VARCHAR), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ),
    a AS (
      SELECT event_type,
             least(count(*), 64)::BIGINT AS n_kmin,
             max(CASE WHEN rn = 64 THEN h END) AS vk,
             count(*)::BIGINT AS nd
      FROM r GROUP BY event_type
    ),
    e AS (
      SELECT a.event_type, a.n_kmin,
             round(CASE WHEN a.n_kmin < 64 THEN a.n_kmin::DOUBLE
                   ELSE 63.0 * 1152921504606846976.0 / a.vk END, 6) AS est,
             a.nd AS exact
      FROM a
    )
    SELECT event_type, n_kmin, est, exact,
           round(abs(est - exact) / exact, 6) AS rel_err
    FROM e ORDER BY event_type
"""
QUERIES["x7_kmv_distinct"] = x7_kmv_distinct


@query(
    "x7_weighted_quantiles",
    """
    WITH per AS (
      SELECT l_returnflag, l_extendedprice AS v,
             sum(l_quantity::DECIMAL(28,6)) AS w
      FROM lineitem WHERE l_quantity > 0
      GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, v, w,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM per
    )
    SELECT l_returnflag, q, min(v) AS value FROM (
      SELECT l_returnflag, 0.5::DOUBLE AS q, v FROM c
      WHERE cum::DOUBLE >= 0.5 * tot::DOUBLE
      UNION ALL
      SELECT l_returnflag, 0.9::DOUBLE, v FROM c
      WHERE cum::DOUBLE >= 0.9 * tot::DOUBLE
    ) GROUP BY 1, 2 ORDER BY l_returnflag, q
    """,
)
def x7_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — quantity-weighted price quantiles per return flag (round
    7): the smallest price whose cumulative QUANTITY share reaches
    q — what "median price weighted by volume" means, where the
    unweighted percentile pretends a 1-unit and a 50-unit line
    matter equally. The corpus folds to one exact-decimal weight per
    distinct (flag, price); the threshold scan windows over that
    frame (operators/sketches.py:weighted_quantiles). Full oracle."""
    from vectordb_migrator_spark.operators.sketches import (
        weighted_quantiles,
    )

    return weighted_quantiles(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        [0.5, 0.9],
        group_cols=["l_returnflag"],
    )


@query(
    "x7_jackknife_ci",
    """
    WITH b AS (
      SELECT event_type,
             CAST(CONCAT('0x', substr(md5(user_id::VARCHAR || ':7'),
                                      1, 8)) AS BIGINT) % 50 AS bkt,
             sum(value::DECIMAL(28,6)) AS s, count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT event_type, sum(s) AS st, sum(n) AS nt,
                 count(*)::BIGINT AS nb
          FROM b GROUP BY 1),
    loo AS (
      SELECT b.event_type,
             (t.st - b.s)::DOUBLE / nullif(t.nt - b.n, 0)::DOUBLE AS m,
             t.st, t.nt, t.nb
      FROM b JOIN t USING (event_type)
    ),
    mb AS (
      SELECT event_type, avg(m) AS mbar, max(nb) AS nb,
             max(nt)::BIGINT AS n,
             round(max(st)::DOUBLE / max(nt)::DOUBLE, 6) AS mean
      FROM loo GROUP BY 1
    ),
    v AS (
      SELECT l.event_type, max(mb.n) AS n, max(mb.mean) AS mean,
             max(mb.nb) AS nb,
             sum((l.m - mb.mbar) * (l.m - mb.mbar)) AS ss
      FROM loo l JOIN mb USING (event_type) GROUP BY 1
    )
    SELECT event_type, n, mean, nb::BIGINT AS n_buckets,
           round(sqrt((nb - 1)::DOUBLE / nb * ss), 6) AS se,
           round(mean - 1.96 * sqrt((nb - 1)::DOUBLE / nb * ss), 6)
             AS ci_lo,
           round(mean + 1.96 * sqrt((nb - 1)::DOUBLE / nb * ss), 6)
             AS ci_hi
    FROM v ORDER BY event_type
    """,
)
def x7_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — delete-one-bucket jackknife CI for mean event value per
    event type (round 7): users hash into 50 cohorts (all of a user's
    events leave together, respecting within-user correlation), each
    leave-one-bucket-out mean is closed-form arithmetic on the bucket
    aggregates, and var = (B−1)/B·Σ(θ₍ᵢ₎−θ̄)². The variance estimator
    big experimentation pipelines use at corpus scale: ONE exact
    decimal aggregate pass reduces 100 TB to groups×50 rows; the B
    "replicas" cost zero rescans (why jackknife beats bootstrap here).
    md5 cohort coin → engine-reproducible, full oracle
    (operators/scale.py:jackknife_ci)."""
    from vectordb_migrator_spark.operators.scale import jackknife_ci

    ev = _t(spark, sf_dir, "events")
    return jackknife_ci(
        ev,
        "value",
        unit_col="user_id",
        buckets=50,
        group_cols=["event_type"],
        seed=7,
    )


@query(
    "x7_ks_test",
    """
    WITH m AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid
               FROM events),
    t AS (SELECT event_type, value,
                 CASE WHEN epoch(ts) <= m.mid THEN 1 ELSE 0 END AS isa
          FROM events, m WHERE value IS NOT NULL),
    c AS (SELECT event_type, value AS v,
                 sum(isa)::BIGINT AS ca,
                 sum(1 - isa)::BIGINT AS cb
          FROM t GROUP BY 1, 2),
    w AS (SELECT event_type, v, ca, cb,
                 sum(ca) OVER (PARTITION BY event_type ORDER BY v
                               ROWS UNBOUNDED PRECEDING) AS cum_a,
                 sum(cb) OVER (PARTITION BY event_type ORDER BY v
                               ROWS UNBOUNDED PRECEDING) AS cum_b,
                 sum(ca) OVER (PARTITION BY event_type) AS na,
                 sum(cb) OVER (PARTITION BY event_type) AS nb
          FROM c),
    a AS (SELECT event_type,
                 max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
                 max(abs(cum_a::DOUBLE / na - cum_b::DOUBLE / nb))
                   AS d
          FROM w GROUP BY 1)
    SELECT event_type, n_a, n_b, round(d, 6) AS d,
           round(1.358 * sqrt((n_a::DOUBLE + n_b)
                              / (n_a::DOUBLE * n_b)), 6) AS d_crit,
           round(d, 6) > round(1.358 * sqrt((n_a::DOUBLE + n_b)
                               / (n_a::DOUBLE * n_b)), 6) AS significant
    FROM a ORDER BY event_type
    """,
)
def x7_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — two-sample Kolmogorov–Smirnov D between the event log's
    time halves, per event type (round 7): max ECDF gap with the
    asymptotic α=0.05 threshold — sensitive anywhere on the CDF,
    completing the shift-test trio (``x7_mannwhitney`` location,
    ``x12_psi_drift`` binned shape, KS everywhere). ECDFs change only
    at distinct values, so the corpus folds to one
    (type, value, ca, cb) aggregate and D is a running-max window on
    that small frame — no rank over raw events; D is exact rational
    count arithmetic (engine-exact)
    (operators/scale.py:ks_test). Full oracle."""
    from vectordb_migrator_spark.operators.scale import ks_test

    ev = _t(spark, sf_dir, "events")
    mid = ev.agg(
        (
            (F.min(F.col("ts").cast("double"))
             + F.max(F.col("ts").cast("double"))) / 2
        ).alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid)).withColumn(
        "side",
        F.when(F.col("ts").cast("double") <= F.col("mid"), "a")
        .otherwise("b"),
    )
    return ks_test(
        tagged, "value", side_col="side", side_a="a",
        group_cols=["event_type"],
    )


@query(
    "x7_mannwhitney",
    """
    WITH m AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid
               FROM events),
    t AS (SELECT event_type, value,
                 CASE WHEN epoch(ts) <= m.mid THEN 1 ELSE 0 END AS isa
          FROM events, m WHERE value IS NOT NULL),
    c AS (SELECT event_type, value AS v,
                 sum(isa)::BIGINT AS ca,
                 sum(1 - isa)::BIGINT AS cb
          FROM t GROUP BY 1, 2),
    w AS (SELECT event_type, ca, cb,
                 coalesce(sum(cb) OVER (PARTITION BY event_type
                          ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS cum_b
          FROM c),
    a AS (SELECT event_type,
                 sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
                 sum(ca * (cum_b + 0.5 * cb)) AS u,
                 sum((ca + cb)::DOUBLE * (ca + cb) * (ca + cb)
                     - (ca + cb)) AS ties
          FROM w GROUP BY 1),
    zc AS (
      SELECT event_type, n_a, n_b, u,
             (u - n_a::DOUBLE * n_b / 2.0)
             / nullif(sqrt(n_a::DOUBLE * n_b / 12.0
                 * (((n_a + n_b)::DOUBLE + 1)
                    - ties / ((n_a + n_b)::DOUBLE
                              * ((n_a + n_b)::DOUBLE - 1)))), 0) AS z
      FROM a
    )
    SELECT event_type, n_a, n_b, round(u::DOUBLE, 6) AS u,
           round(z, 6) AS z,
           abs(round(z, 6)) > 1.96 AS significant
    FROM zc ORDER BY event_type
    """,
)
def x7_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — Mann–Whitney U (tie-corrected normal approximation)
    between the event log's first and second time halves, per event
    type (round 7): the nonparametric "did the value distribution
    shift" test that stays valid on skewed/heavy-tailed values, next
    to ``x7_cuped``/``x7_jackknife_ci``'s mean-based statistics and
    ``x12_psi_drift``'s binned shape score. No ranks, no global row
    sort: U depends only on per-DISTINCT-VALUE side counts, so the
    corpus folds to a (type, value, ca, cb) aggregate and the rank
    arithmetic windows over that small frame. Every term is an exact
    double (counts, halves, integer cubes < 2⁵³) so the statistic is
    engine-exact (operators/scale.py:mann_whitney). Full oracle."""
    from vectordb_migrator_spark.operators.scale import mann_whitney

    ev = _t(spark, sf_dir, "events")
    mid = ev.agg(
        (
            (F.min(F.col("ts").cast("double"))
             + F.max(F.col("ts").cast("double"))) / 2
        ).alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid)).withColumn(
        "side",
        F.when(F.col("ts").cast("double") <= F.col("mid"), "a")
        .otherwise("b"),
    )
    return mann_whitney(
        tagged, "value", side_col="side", side_a="a",
        group_cols=["event_type"],
    )


@query(
    "x7_power_analysis",
    """
    WITH m AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid
               FROM events),
    per AS (
      SELECT event_type, user_id,
             sum(CASE WHEN epoch(ts) <= m.mid
                 THEN value END::DECIMAL(28,6)) AS ps,
             count(*) FILTER (WHERE epoch(ts) <= m.mid) AS pn,
             sum(CASE WHEN epoch(ts) > m.mid
                 THEN value END::DECIMAL(28,6)) AS qs,
             count(*) FILTER (WHERE epoch(ts) > m.mid) AS qn
      FROM events, m WHERE user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    u AS (
      SELECT event_type,
             round(ps::DOUBLE / pn, 6)::DECIMAL(18,6) AS x,
             round(qs::DOUBLE / qn, 6)::DECIMAL(18,6) AS y
      FROM per WHERE pn > 0 AND qn > 0
    ),
    s0 AS (
      SELECT event_type, count(*)::BIGINT AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             sum(y * y) AS syy, sum(x * y) AS sxy
      FROM u GROUP BY 1
    ),
    s AS (
      SELECT event_type, n,
             sy::DOUBLE / n AS mean,
             sxx::DOUBLE / n - (sx::DOUBLE / n) * (sx::DOUBLE / n)
               AS varx,
             syy::DOUBLE / n - (sy::DOUBLE / n) * (sy::DOUBLE / n)
               AS vary,
             sxy::DOUBLE / n - (sx::DOUBLE / n) * (sy::DOUBLE / n)
               AS cov
      FROM s0
    )
    SELECT event_type, n AS n_units,
           round(mean, 6) AS mean,
           round(vary, 6) AS var,
           round(2 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
                 * vary / (0.05 * mean * (0.05 * mean)), 6)
             AS n_per_arm,
           round(2 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
                 * greatest(vary * (1 - cov * cov
                                    / nullif(varx * vary, 0)), 0)
                 / (0.05 * mean * (0.05 * mean)), 6)
             AS n_per_arm_cuped
    FROM s ORDER BY event_type
    """,
)
def x7_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — experiment sample-size planning per event type (round 7):
    n per arm = 2(z_{α/2}+z_β)²·σ²/δ² for 80% power at α=0.05
    against a 5%-of-mean effect, computed twice — with the raw
    unit-level variance and with CUPED's residual variance
    σ²(1−ρ²) — so the report shows in USERS what the
    ``x7_cuped`` adjustment buys ("readable N days earlier" made
    concrete). Reuses the same decimal-exact unit-moment fold;
    everything after is closed-form arithmetic. Full oracle."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    mid = ev.agg(
        (
            (F.min(F.col("ts").cast("double"))
             + F.max(F.col("ts").cast("double"))) / 2
        ).alias("mid")
    )
    is_pre = F.col("ts").cast("double") <= F.col("mid")
    per = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(
                F.when(is_pre, F.col("value")).cast("decimal(28,6)")
            ).alias("ps"),
            F.sum(is_pre.cast("long")).alias("pn"),
            F.sum(
                F.when(~is_pre, F.col("value")).cast("decimal(28,6)")
            ).alias("qs"),
            F.sum((~is_pre).cast("long")).alias("qn"),
        )
    )
    x = F.round(F.col("ps").cast("double") / F.col("pn"), 6).cast(
        "decimal(18,6)"
    )
    y = F.round(F.col("qs").cast("double") / F.col("qn"), 6).cast(
        "decimal(18,6)"
    )
    units = per.filter((F.col("pn") > 0) & (F.col("qn") > 0)).select(
        "event_type", x.alias("x"), y.alias("y")
    )
    agg = units.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    mean = sy / n
    varx = sxx / n - (sx / n) * (sx / n)
    vary = syy / n - (sy / n) * (sy / n)
    cov = sxy / n - (sx / n) * (sy / n)
    zz = (1.959964 + 0.841621) * (1.959964 + 0.841621)
    delta2 = (0.05 * mean) * (0.05 * mean)
    rho2 = F.try_divide(cov * cov, varx * vary)
    resid = F.greatest(vary * (1 - rho2), F.lit(0.0))
    return agg.select(
        "event_type",
        F.col("n").alias("n_units"),
        F.round(mean, 6).alias("mean"),
        F.round(vary, 6).alias("var"),
        F.round(2 * zz * vary / delta2, 6).alias("n_per_arm"),
        F.round(2 * zz * resid / delta2, 6).alias("n_per_arm_cuped"),
    ).orderBy("event_type")


@query(
    "x7_cuped",
    """
    WITH m AS (SELECT (epoch(min(ts)) + epoch(max(ts))) / 2 AS mid
               FROM events),
    per AS (
      SELECT event_type, user_id,
             sum(CASE WHEN epoch(ts) <= m.mid
                 THEN value END::DECIMAL(28,6)) AS ps,
             count(*) FILTER (WHERE epoch(ts) <= m.mid) AS pn,
             sum(CASE WHEN epoch(ts) > m.mid
                 THEN value END::DECIMAL(28,6)) AS qs,
             count(*) FILTER (WHERE epoch(ts) > m.mid) AS qn
      FROM events, m WHERE user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    u AS (
      SELECT event_type,
             round(ps::DOUBLE / pn, 6)::DECIMAL(18,6) AS x,
             round(qs::DOUBLE / qn, 6)::DECIMAL(18,6) AS y
      FROM per WHERE pn > 0 AND qn > 0
    ),
    a AS (
      SELECT event_type, count(*)::BIGINT AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             sum(y * y) AS syy, sum(x * y) AS sxy
      FROM u GROUP BY 1
    ),
    s AS (
      SELECT event_type, n,
             sy::DOUBLE / n AS mean,
             sxx::DOUBLE / n - (sx::DOUBLE / n) * (sx::DOUBLE / n)
               AS varx,
             syy::DOUBLE / n - (sy::DOUBLE / n) * (sy::DOUBLE / n)
               AS vary,
             sxy::DOUBLE / n - (sx::DOUBLE / n) * (sy::DOUBLE / n)
               AS cov
      FROM a
    ),
    r AS (
      SELECT event_type, n, mean, vary,
             cov / nullif(varx, 0) AS theta,
             cov * cov / nullif(varx * vary, 0) AS rho2
      FROM s
    )
    SELECT event_type, n,
           round(mean, 6) AS mean,
           round(theta, 6) AS theta,
           round(vary, 6) AS var,
           round(greatest(vary * (1 - rho2), 0), 6) AS var_adjusted,
           round(rho2, 6) AS var_reduction,
           round(sqrt(vary / n), 6) AS se_naive,
           round(sqrt(greatest(vary * (1 - rho2), 0) / n), 6)
             AS se_cuped
    FROM r ORDER BY event_type
    """,
)
def x7_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — CUPED variance reduction per event type (round 7): each
    user's second-half mean value is the experiment metric Y, their
    first-half mean the pre-period covariate X; θ = cov/var(X) and
    var(Y−θ(X−E[X])) = var(Y)(1−ρ²) — the adjustment that makes A/B
    readouts significant days earlier, and next to
    ``x7_jackknife_ci`` the second pillar of experimentation
    statistics at corpus scale. ONE grouped pass builds the unit
    frame, ONE moment aggregate (6dp-rounded decimal sums →
    bit-reproducible across engines and partition orders) yields
    every statistic closed-form
    (operators/scale.py:cuped_adjust). Full oracle."""
    from vectordb_migrator_spark.operators.scale import cuped_adjust

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    mid = ev.agg(
        (
            (F.min(F.col("ts").cast("double"))
             + F.max(F.col("ts").cast("double"))) / 2
        ).alias("mid")
    )
    is_pre = F.col("ts").cast("double") <= F.col("mid")
    per = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(
                F.when(is_pre, F.col("value")).cast("decimal(28,6)")
            ).alias("ps"),
            F.sum(is_pre.cast("long")).alias("pn"),
            F.sum(
                F.when(~is_pre, F.col("value")).cast("decimal(28,6)")
            ).alias("qs"),
            F.sum((~is_pre).cast("long")).alias("qn"),
        )
    )
    units = per.filter((F.col("pn") > 0) & (F.col("qn") > 0)).select(
        "event_type",
        F.round(F.col("ps").cast("double") / F.col("pn"), 6).alias("x"),
        F.round(F.col("qs").cast("double") / F.col("qn"), 6).alias("y"),
    )
    return cuped_adjust(
        units,
        metric_col="y",
        covariate_col="x",
        group_cols=["event_type"],
    )


@query("x7_hll_daily_merge")  # Apache DataSketches binary → rows-only
# check; the estimate's accuracy is asserted in tests vs countDistinct.
def x7_hll_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — the MERGEABLE-sketch rollup pattern: per-day HLL sketches
    of distinct users (`hll_sketch_agg`, Apache DataSketches), then
    `hll_union_agg` merges the daily sketches into the period estimate
    WITHOUT touching raw events again. This is how a 100 TB metrics
    store answers "distinct users any date range" — materialize one
    kilobyte-sized sketch per (day, …) cell once, and every later
    rollup is a union over sketches instead of a re-scan + exact
    distinct shuffle of the raw data."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
    )
    return daily.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("distinct_users_est"),
    )


@query("x7_audience_overlap")  # sketch binaries → rows-only; accuracy
# vs exact intersection asserted in tests/test_pipeline differential.
def x7_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — sketch-based audience OVERLAP via inclusion-exclusion:
    |A∩B| ≈ |A| + |B| − |A∪B| from the stored per-day HLL sketches —
    the question ("how many users were active in BOTH halves of the
    period?") that raw-data answers need an expensive distinct
    intersection for, answered here entirely from kilobyte sketches
    (HLL has no native intersect; inclusion-exclusion over unions is
    the standard estimator, with error growing as the overlap
    shrinks — reported alongside the inputs so consumers can judge).
    One daily-sketch pass, then sketch algebra on driver-tiny rows."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    mid = daily.agg(F.min("day") + ((F.max("day") - F.min("day")) / 2))
    mid_day = mid.first()[0]
    a = daily.filter(F.col("day") <= F.lit(mid_day)).agg(
        F.hll_union_agg("sk").alias("ska")
    )
    b = daily.filter(F.col("day") > F.lit(mid_day)).agg(
        F.hll_union_agg("sk").alias("skb")
    )
    return (
        a.crossJoin(b)
        .select(
            F.hll_sketch_estimate("ska").cast("long").alias("est_a"),
            F.hll_sketch_estimate("skb").cast("long").alias("est_b"),
            F.hll_sketch_estimate(F.hll_union("ska", "skb"))
            .cast("long")
            .alias("est_union"),
            (
                F.hll_sketch_estimate("ska")
                + F.hll_sketch_estimate("skb")
                - F.hll_sketch_estimate(F.hll_union("ska", "skb"))
            )
            .cast("long")
            .alias("est_intersection"),
        )
    )
