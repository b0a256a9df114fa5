"""Registry family ``s12_round10`` — round-10 queries (real baseline
JPEG decode, graph-ANN recall certificate, power-iteration PCA anchor,
and later additions)."""

from __future__ import annotations

# ruff: noqa: E501
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_migrator_spark.suite._shared import (
    _t,
    query,
)


@query(
    "x6_jpeg_decode",
    """
    WITH dims AS (
      SELECT doc_id,
             (8 * (1 + doc_id % 3) + doc_id % 5)::INT AS w,
             (8 * (1 + doc_id % 2) + doc_id % 3)::INT AS h
      FROM documents
    ),
    g AS (
      SELECT xs.range AS bx, ys.range AS by
      FROM range(0, 4) xs, range(0, 3) ys
    ),
    blocks AS (
      SELECT d.doc_id, d.w, d.h,
             ((37 * g.bx + 59 * g.by + d.doc_id) % 256)::BIGINT AS v,
             (least(d.w, 8 * (g.bx + 1)) - 8 * g.bx)::BIGINT AS nx,
             (least(d.h, 8 * (g.by + 1)) - 8 * g.by)::BIGINT AS ny
      FROM dims d JOIN g ON 8 * g.bx < d.w AND 8 * g.by < d.h
    )
    SELECT doc_id,
           max(w) AS width, max(h) AS height,
           1::INT AS n_components,
           (max(w) * max(h))::BIGINT AS n_pixels,
           sum(v * nx * ny)::BIGINT AS sum_r,
           sum(v * nx * ny)::BIGINT AS sum_g,
           sum(v * nx * ny)::BIGINT AS sum_b,
           (doc_id % 256)::INT AS px00_r,
           (doc_id % 256)::INT AS px00_g,
           (doc_id % 256)::INT AS px00_b
    FROM blocks GROUP BY doc_id ORDER BY doc_id
    """,
)
def x6_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — REAL baseline JPEG decode (round 10): the fourth real
    decode tier after BMP / PNG / GIF, retiring the last multimodal
    stub. The full ITU T.81 SOF0 pipeline runs on actual
    entropy-coded bytes — marker walk, file-driven DQT/DHT, Huffman
    decode with DC prediction + EXTEND, byte unstuffing, DRI/RSTn
    restarts (fixtures rotate restart_interval = doc_id % 4 so the
    restart path gets driver evidence), dequantize, un-zigzag, exact
    float IDCT. Fixtures plant BLOCK-CONSTANT gray gradients
    v = (37*bx + 59*by + doc_id) mod 256 with a unit quant table, so
    every block is DC-only and the decode is integer-EXACT end to end
    — the oracle recomputes the channel sums from a block-grid join;
    one wrong Huffman bit or IDCT slip moves sum_r. Widths/heights
    deliberately off the 8-multiple grid to exercise MCU padding +
    crop. The decoder is additionally pinned in
    tests/test_multimodal.py against a bitstream hand-assembled from
    the spec's canonical-code rules, independent of jpeg_encode
    (operators/multimodal.py:jpeg_decode)."""
    from vectordb_migrator_spark.operators.multimodal import (
        JPEG_SCHEMA,
        fused_fixture_features,
        jpeg_feature_row,
    )

    def make_payload(d: int) -> bytes:
        import numpy as np

        from vectordb_migrator_spark.operators.multimodal import jpeg_encode

        w = 8 * (1 + d % 3) + d % 5
        h = 8 * (1 + d % 2) + d % 3
        px = np.empty((h, w), np.uint8)
        for by in range(-(-h // 8)):
            for bx in range(-(-w // 8)):
                px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    37 * bx + 59 * by + d
                ) % 256
        return jpeg_encode(px, restart_interval=d % 4)

    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        make_payload,
        jpeg_feature_row,
        JPEG_SCHEMA,
    ).orderBy("doc_id")


def _kg_sql() -> str:
    """Hop-unrolled DuckDB oracle for x4_knn_graph_recall: the md5
    sample, the exact int64 k-NN graph, the beam walk at hops 2/4/6,
    and the visited-node accounting, all replayed in SQL."""
    fx = (
        "list_transform({col}, x -> (CASE WHEN x >= 0 THEN "
        "floor(x * 10000.0 + 0.5) ELSE -floor(-x * 10000.0 + 0.5) "
        "END)::BIGINT)"
    )
    d2 = (
        "list_sum([ ({a}[i+1] - {b}[i+1]) * ({a}[i+1] - {b}[i+1]) "
        "for i in range(64) ])::BIGINT"
    )
    hop = """
    b{t} AS MATERIALIZED (
      SELECT id, qd FROM (
        SELECT id, qd, row_number() OVER (ORDER BY qd, id) AS rk
        FROM (
          SELECT DISTINCT id, qd FROM (
            SELECT id, qd FROM b{p}
            UNION ALL
            SELECT q.id, q.qd
            FROM b{p} JOIN edges e ON e.src = b{p}.id
                      JOIN qd q ON q.id = e.dst))
      ) WHERE rk <= 12
    ),
    v{t} AS MATERIALIZED (
      SELECT DISTINCT id FROM (
        SELECT id FROM v{p}
        UNION ALL
        SELECT e.dst AS id FROM b{p} JOIN edges e ON e.src = b{p}.id)
    )"""
    mode = """
    SELECT (SELECT count(*) FROM samp)::BIGINT AS n_nodes,
           (SELECT count(*) FROM edges)::BIGINT AS n_edges,
           2::BIGINT AS n_entries,
           12::BIGINT AS beam_width,
           {t}::BIGINT AS hops,
           (SELECT count(*) FROM v{t})::BIGINT AS n_visited,
           (SELECT count(*) FROM (
              SELECT id FROM (
                SELECT id, row_number() OVER (ORDER BY qd, id) AS rk
                FROM b{t}) WHERE rk <= 10) r
            JOIN truth USING (id))::BIGINT AS n_hits,
           round((SELECT count(*) FROM (
              SELECT id FROM (
                SELECT id, row_number() OVER (ORDER BY qd, id) AS rk
                FROM b{t}) WHERE rk <= 10) r
            JOIN truth USING (id)) / 10.0, 6) AS recall_at_k"""
    hops = "".join(
        "," + hop.format(t=t, p=t - 1) for t in range(1, 7)
    )
    modes = " UNION ALL ".join(mode.format(t=t) for t in (2, 4, 6))
    return f"""
    WITH p AS (
      SELECT {fx.format(col="(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)")} AS pv
    ),
    samp AS MATERIALIZED (
      SELECT vec_id AS id, {fx.format(col="embedding::DOUBLE[]")} AS v
      FROM embeddings
      ORDER BY md5(vec_id::VARCHAR || ':kg:7'), vec_id LIMIT 256
    ),
    qd AS MATERIALIZED (
      SELECT s.id, {d2.format(a="s.v", b="p.pv")} AS qd FROM samp s, p
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT a.id AS src, b.id AS dst,
               row_number() OVER (PARTITION BY a.id
                 ORDER BY {d2.format(a="a.v", b="b.v")}, b.id) AS rk
        FROM samp a JOIN samp b ON a.id <> b.id)
      WHERE rk <= 6
    ),
    b0 AS MATERIALIZED (
      SELECT id, qd FROM qd
      ORDER BY md5(id::VARCHAR || ':kgentry:7'), id LIMIT 2
    ),
    v0 AS (SELECT id FROM b0),
    truth AS MATERIALIZED (
      SELECT id FROM (
        SELECT id, row_number() OVER (ORDER BY qd, id) AS rk FROM qd)
      WHERE rk <= 10
    ){hops}
    SELECT * FROM ({modes}) ORDER BY hops
    """


@query("x4_knn_graph_recall", _kg_sql())
def x4_knn_graph_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — graph-ANN recall certificate (round 10): the HNSW/NSW
    family every modern vector DB defaults to (including the
    reference's Qdrant backend, whose hnsw_config the connector
    plumbs through), reduced to its testable core — an exact k-NN
    graph over a bounded md5 sample, greedy beam-search routing from
    fixed entry points, and the recall@10-vs-visited-nodes curve at
    hops 2/4/6: the walk visits a FRACTION of the graph and recall
    climbs with walk depth, which is the structural trade graph
    indexes exist for. All arithmetic is int64 fixed point with
    id-ascending ties, so graph edges, the beam trajectory, and the
    final top-k replay bit-for-bit in the hop-unrolled SQL oracle
    (operators/similarity.py:knn_graph_beam_recall)."""
    from vectordb_migrator_spark.operators.similarity import (
        knn_graph_beam_recall,
    )
    from vectordb_migrator_spark.suite._shared import _probe_vector

    emb = _t(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    return knn_graph_beam_recall(
        emb, probe, hops=6, report_hops=(2, 4, 6), beam_width=12,
        degree=6, n_entries=2, sample_size=256, k=10, seed=7,
    )


def _pi_sql() -> str:
    """Recursive-CTE DuckDB oracle for x9_power_iteration: exact
    integer scatter, the shift/divide rescale, the 8-step fixed-point
    power iteration, and the final IEEE metric divisions, all
    mirrored operation for operation."""
    fx = (
        "list_transform(embedding::DOUBLE[], x -> (CASE WHEN x >= 0 "
        "THEN floor(x * 100.0 + 0.5) ELSE -floor(-x * 100.0 + 0.5) "
        "END)::BIGINT)"
    )
    return f"""
    WITH RECURSIVE base AS MATERIALIZED (
      SELECT {fx} AS v FROM embeddings
    ),
    mom AS MATERIALIZED (
      SELECT (i - 1) * 64 + (j - 1) AS ij,
             sum(v[i] * v[j])::BIGINT AS sxx
      FROM base, range(1, 65) ti(i), range(1, 65) tj(j)
      GROUP BY 1
    ),
    sums AS MATERIALIZED (
      SELECT i - 1 AS i, sum(v[i])::BIGINT AS sx, count(*)::BIGINT AS n
      FROM base, range(1, 65) t(i) GROUP BY 1
    ),
    one AS (
      SELECT (SELECT list(sxx ORDER BY ij) FROM mom) AS sxx,
             (SELECT list(sx ORDER BY i) FROM sums) AS sx,
             (SELECT max(n) FROM sums) AS n
    ),
    cmat AS (
      SELECT n,
             [ (n * sxx[k + 1]
                - sx[(k // 64) + 1] * sx[(k % 64) + 1])::BIGINT
               for k in range(4096) ] AS c
      FROM one
    ),
    bmat AS MATERIALIZED (
      SELECT n,
             list_max(list_transform(c, x -> abs(x))) AS cmax,
             [ (CASE WHEN x >= 0
                THEN ((x - x % g) / g)
                ELSE -(((-x) - (-x) % g) / g) END)::BIGINT
               for x in c ] AS b
      FROM (
        SELECT n, c,
               greatest(1::BIGINT,
                        list_max(list_transform(c, x -> abs(x))) >> 18)
                 AS g
        FROM cmat)
    ),
    it AS (
      SELECT 0 AS rk,
             [10000::BIGINT for _ in range(64)] AS prev,
             [10000::BIGINT for _ in range(64)] AS cur
      UNION ALL
      -- mw <= 0 keeps BOTH prev and cur (the engine's F.when(...)
      -- returns the whole accumulator unchanged)
      SELECT rk + 1,
             CASE WHEN mw <= 0 THEN prev ELSE cur END,
             CASE WHEN mw <= 0 THEN cur
                  ELSE [ (CASE WHEN x >= 0
                          THEN ((x * 10000 - (x * 10000) % mw) / mw)
                          ELSE -(((-x) * 10000 - ((-x) * 10000) % mw)
                                 / mw) END)::BIGINT
                         for x in w ] END
      FROM (
        SELECT rk, prev, cur, w,
               list_max(list_transform(w, x -> abs(x))) AS mw
        FROM (
          SELECT it.rk, it.prev, it.cur,
                 [ list_sum([ b.b[i * 64 + j + 1] * it.cur[j + 1]
                              for j in range(64) ])::BIGINT
                   for i in range(64) ] AS w
          FROM it, bmat b WHERE it.rk < 8))
    ),
    fin AS (
      SELECT prev AS pv, cur AS cv FROM it WHERE rk = 8
    ),
    met AS (
      SELECT b.n, b.cmax, b.b, f.pv, f.cv,
             list_sum([ f.cv[i + 1] * f.cv[i + 1]
                        for i in range(64) ])::BIGINT AS vtv,
             list_sum([ f.pv[i + 1] * f.pv[i + 1]
                        for i in range(64) ])::BIGINT AS ptp,
             list_sum([ f.cv[i + 1] * f.pv[i + 1]
                        for i in range(64) ])::BIGINT AS vp,
             list_sum([ f.cv[i + 1] *
                        list_sum([ b.b[i * 64 + j + 1] * f.cv[j + 1]
                                   for j in range(64) ])
                        for i in range(64) ])::BIGINT AS vbv,
             list_sum([ b.b[i * 64 + i + 1]
                        for i in range(64) ])::BIGINT AS trace_b,
             [ i for i in range(64)
               if abs(f.cv[i + 1]) =
                  list_max(list_transform(f.cv, x -> abs(x))) ][1]
               AS top_dim
      FROM bmat b, fin f
    )
    SELECT n,
           64::INT AS d,
           8::INT AS iters,
           CASE WHEN cmax <= 0 THEN NULL
                ELSE round(vbv::DOUBLE / vtv::DOUBLE / trace_b::DOUBLE,
                           6) END AS evr1,
           CASE WHEN cmax <= 0 THEN NULL
                ELSE round(vp::DOUBLE /
                           sqrt(vtv::DOUBLE * ptp::DOUBLE), 6)
                END AS align,
           CASE WHEN cmax <= 0 THEN NULL ELSE top_dim::INT END
             AS top_dim,
           CASE WHEN cmax <= 0 THEN NULL
                ELSE cv[top_dim + 1] END AS top_loading
    FROM met
    """


@query("x9_power_iteration", _pi_sql())
def x9_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — fixed-point power iteration for the dominant principal
    component (round 10): the engine-exact anchor for the PCA family,
    built the way the integer Lloyd unroll anchored PQ. The exact
    int64 centered scatter n·Σxxᵀ−(Σx)(Σx)ᵀ accumulates as
    partition-order-independent integer partials (one local NumPy
    XᵀX per Arrow batch — O(partitions·d²) bytes move); an integer
    shift/divide rescale bounds every later product inside the 2⁵³
    double-exact window; and the whole 8-step iteration runs inside
    ONE F.aggregate on a single row — zero per-step jobs. Reported:
    evr1 (PC1 explained-variance ratio via the Rayleigh quotient),
    align (cosine of the last two iterates — the convergence
    certificate), and the argmax loading coordinate. Full oracle via
    a recursive CTE replaying the identical integer trajectory
    (operators/decomposition.py:power_iteration_pc1)."""
    from vectordb_migrator_spark.operators.decomposition import (
        power_iteration_pc1,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    return power_iteration_pc1(
        fan_out(_t(spark, sf_dir, "embeddings").select("embedding"))
    )


def _jc_sql() -> str:
    """Block-grid DuckDB oracle for x6_jpeg_color_decode: the exact
    RGB -> YCbCr -> RGB double-precision chain (round-half-up + clamp
    at each stage, mirroring the codec's IEEE arithmetic) applied per
    constant block, times the block's pixel count."""
    rh = "(CASE WHEN ({x}) >= 0 THEN floor(({x}) + 0.5) ELSE -floor(-({x}) + 0.5) END)"
    cl = "least(greatest({x}, 0.0), 255.0)"

    def chain(expr):
        return cl.format(x=rh.format(x=expr))

    y = chain("0.299 * r + 0.587 * g + 0.114 * b")
    cb = chain("128 - 0.168736 * r - 0.331264 * g + 0.5 * b")
    cr = chain("128 + 0.5 * r - 0.418688 * g - 0.081312 * b")
    r2 = chain("y + 1.402 * (cr - 128)")
    g2 = chain("y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)")
    b2 = chain("y + 1.772 * (cb - 128)")
    return f"""
    WITH dims AS (
      SELECT doc_id,
             (8 * (1 + doc_id % 3) + doc_id % 5)::INT AS w,
             (8 * (1 + doc_id % 2) + doc_id % 3)::INT AS h
      FROM documents
    ),
    grid AS (
      SELECT xs.range AS bx, ys.range AS by
      FROM range(0, 4) xs, range(0, 3) ys
    ),
    blocks AS (
      SELECT d.doc_id, d.w, d.h, g.bx, g.by,
             ((37 * g.bx + 59 * g.by + d.doc_id) % 256)::DOUBLE AS r,
             ((17 * g.bx + 43 * g.by + 2 * d.doc_id + 7) % 256)::DOUBLE AS g,
             ((29 * g.bx + 31 * g.by + 3 * d.doc_id + 13) % 256)::DOUBLE AS b,
             (least(d.w, 8 * (g.bx + 1)) - 8 * g.bx)::BIGINT AS nx,
             (least(d.h, 8 * (g.by + 1)) - 8 * g.by)::BIGINT AS ny
      FROM dims d JOIN grid g ON 8 * g.bx < d.w AND 8 * g.by < d.h
    ),
    ycc AS (
      SELECT doc_id, w, h, bx, by, nx, ny,
             {y} AS y, {cb} AS cb, {cr} AS cr
      FROM blocks
    ),
    dec AS (
      SELECT doc_id, w, h, bx, by, nx, ny,
             {r2}::BIGINT AS dr, {g2}::BIGINT AS dg, {b2}::BIGINT AS db
      FROM ycc
    )
    SELECT doc_id,
           max(w) AS width, max(h) AS height,
           3::INT AS n_components,
           (max(w) * max(h))::BIGINT AS n_pixels,
           sum(dr * nx * ny)::BIGINT AS sum_r,
           sum(dg * nx * ny)::BIGINT AS sum_g,
           sum(db * nx * ny)::BIGINT AS sum_b,
           max(CASE WHEN bx = 0 AND by = 0 THEN dr END)::INT AS px00_r,
           max(CASE WHEN bx = 0 AND by = 0 THEN dg END)::INT AS px00_g,
           max(CASE WHEN bx = 0 AND by = 0 THEN db END)::INT AS px00_b
    FROM dec GROUP BY doc_id ORDER BY doc_id
    """


@query("x6_jpeg_color_decode", _jc_sql())
def x6_jpeg_color_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — REAL color JPEG decode (round 10): driver evidence for
    the 3-component path the gray query can't reach — three
    interleaved YCbCr blocks per MCU, per-component DC predictors,
    and the JFIF YCbCr->RGB conversion. Fixtures plant BLOCK-CONSTANT
    RGB gradients with a unit quant table: each block is DC-only in
    every component, so the decode chain RGB -> (round, clamp) YCbCr
    -> entropy code -> decode -> (round, clamp) RGB is reproducible
    arithmetic end to end, and the oracle replays the identical IEEE
    double chain per block times the block's pixel count. One wrong
    predictor, interleave slot, or conversion constant moves the
    channel sums (operators/multimodal.py:jpeg_decode)."""
    from vectordb_migrator_spark.operators.multimodal import (
        JPEG_SCHEMA,
        fused_fixture_features,
        jpeg_feature_row,
    )

    def make_payload(d: int) -> bytes:
        import numpy as np

        from vectordb_migrator_spark.operators.multimodal import jpeg_encode

        w = 8 * (1 + d % 3) + d % 5
        h = 8 * (1 + d % 2) + d % 3
        px = np.empty((h, w, 3), np.uint8)
        for by in range(-(-h // 8)):
            for bx in range(-(-w // 8)):
                px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0] = (
                    37 * bx + 59 * by + d
                ) % 256
                px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 1] = (
                    17 * bx + 43 * by + 2 * d + 7
                ) % 256
                px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 2] = (
                    29 * bx + 31 * by + 3 * d + 13
                ) % 256
        return jpeg_encode(px)

    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        make_payload,
        jpeg_feature_row,
        JPEG_SCHEMA,
    ).orderBy("doc_id")


@query(
    "x7_mann_whitney",
    """
    WITH base AS (
      SELECT event_type, value::DOUBLE AS v,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, a,
             (2 * rank() OVER (PARTITION BY event_type ORDER BY v)
              + count(*) OVER (PARTITION BY event_type, v)
              - 1)::BIGINT AS r2,
             count(*) OVER (PARTITION BY event_type, v)::BIGINT AS t
      FROM base
    ),
    agg AS (
      SELECT event_type,
             sum(a)::BIGINT AS n1,
             sum(1 - a)::BIGINT AS n2,
             sum(CASE WHEN a = 1 THEN r2 END)::BIGINT AS r2a,
             sum(t * t - 1)::BIGINT AS ties
      FROM ranked GROUP BY 1
    ),
    met AS (
      SELECT event_type, n1, n2,
             (r2a::DOUBLE - n1 * (n1 + 1)) / 2.0 AS u1r,
             n1::DOUBLE * n2 / 2.0 AS mu,
             n1::DOUBLE * n2 / 12.0 *
               ((n1 + n2 + 1)::DOUBLE
                - ties::DOUBLE / ((n1 + n2) * (n1 + n2 - 1))::DOUBLE)
               AS var
      FROM agg
    )
    SELECT event_type, n1, n2,
           round(u1r, 1) AS u1,
           CASE WHEN n1 > 0 AND n2 > 0 AND var > 0
                THEN round((u1r - mu) / sqrt(var), 6) END AS z,
           CASE WHEN n1 > 0 AND n2 > 0 AND var > 0
                THEN abs(round((u1r - mu) / sqrt(var), 6)) > 1.959964
                END AS significant
    FROM met ORDER BY event_type
    """,
)
def x7_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — Mann–Whitney U rank-sum test per event type (round 10):
    the distribution-free two-sample gate the mean-based family
    (t-interval / TOST / ANOVA) can't replace on heavy-tailed metrics
    — sample A = even user_ids, B = odd, the canonical A/B split.
    Average ranks for ties are carried as the INTEGER 2·rank, so the
    rank sum, U, and the Σ(t³−t) tie correction are exact int64 on
    both engines; only the final z divisions run in IEEE doubles.
    The one sort is the per-group rank window every rank statistic
    needs; everything after is a map-side-combinable fold
    (operators/scale.py:mann_whitney_report)."""
    from vectordb_migrator_spark.operators.scale import (
        mann_whitney_report,
    )

    return mann_whitney_report(
        _t(spark, sf_dir, "events"),
        "value",
        group_cols=["event_type"],
        split_expr=F.col("user_id") % 2 == 0,
    )


def _kgc_sql() -> str:
    """Transitive-closure DuckDB oracle for x4_knn_graph_components:
    same sample + exact k-NN graph as the recall certificate, then
    min-reachable-id per node via a recursive CTE."""
    fx = (
        "list_transform(embedding::DOUBLE[], x -> (CASE WHEN x >= 0 "
        "THEN floor(x * 10000.0 + 0.5) ELSE -floor(-x * 10000.0 + 0.5) "
        "END)::BIGINT)"
    )
    d2 = (
        "list_sum([ (a.v[i+1] - b.v[i+1]) * (a.v[i+1] - b.v[i+1]) "
        "for i in range(64) ])::BIGINT"
    )
    return f"""
    WITH RECURSIVE samp AS MATERIALIZED (
      SELECT vec_id AS id, {fx} AS v
      FROM embeddings
      ORDER BY md5(vec_id::VARCHAR || ':kg:7'), vec_id LIMIT 256
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT a.id AS src, b.id AS dst,
               row_number() OVER (PARTITION BY a.id
                 ORDER BY {d2}, b.id) AS rk
        FROM samp a JOIN samp b ON a.id <> b.id)
      WHERE rk <= 6
    ),
    und AS MATERIALIZED (
      SELECT src AS a, dst AS b FROM edges
      UNION
      SELECT dst AS a, src AS b FROM edges
    ),
    reach AS (
      SELECT id, id AS r FROM samp
      UNION
      SELECT u.b AS id, reach.r FROM reach JOIN und u ON u.a = reach.id
    ),
    comps AS (
      SELECT id, min(r) AS comp FROM reach GROUP BY id
    ),
    sizes AS (
      SELECT comp, count(*)::BIGINT AS sz FROM comps GROUP BY comp
    )
    SELECT (SELECT count(*) FROM samp)::BIGINT AS n_nodes,
           (SELECT count(*) FROM edges)::BIGINT AS n_edges,
           count(*)::BIGINT AS n_components,
           max(sz) AS largest_comp,
           min(sz) AS smallest_comp,
           round(max(sz)::DOUBLE /
                 (SELECT count(*) FROM samp)::DOUBLE, 6)
             AS reachable_frac
    FROM sizes
    """


@query("x4_knn_graph_components", _kgc_sql())
def x4_knn_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — k-NN graph connectivity certificate (round 10): beam
    search can only reach the entry point's connected component, so
    the component structure of the undirected k-NN graph is the
    reachability ceiling of graph-ANN routing (the classic shattered
    low-degree-graph failure mode surfaces as reachable_frac < 1).
    Same deterministic md5-sample + int64 graph build as
    x4_knn_graph_recall; components via the library
    min-label-propagation + pointer-jumping kernel; the oracle
    recomputes min-reachable-id per node with a transitive-closure
    recursive CTE (operators/similarity.py:knn_graph_components)."""
    from vectordb_migrator_spark.operators.similarity import (
        knn_graph_components,
    )
    from vectordb_migrator_spark.suite._shared import _probe_vector

    return knn_graph_components(
        _t(spark, sf_dir, "embeddings"),
        _probe_vector(spark, sf_dir),
        degree=6, sample_size=256, seed=7,
    )


@query(
    "x13_cusum_changepoint",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, ts::DATE AS day, round(sum(value), 6) AS v
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type, list(v ORDER BY day) AS ys
      FROM daily GROUP BY 1 HAVING count(*) >= 15
    ),
    prep AS (
      SELECT event_type, ys, len(ys) AS n,
             list_reduce(ys[1:14], (a, b) -> a + b) / 14.0 AS mu
      FROM arr
    ),
    prep2 AS (
      SELECT event_type, ys, n, mu,
             sqrt(list_reduce([ (y - mu) * (y - mu)
                                for y in ys[1:14] ],
                              (a, b) -> a + b) / 14.0) AS sd
      FROM prep
    ),
    rec AS (
      SELECT event_type, ys, n, mu, sd, 14 AS t,
             0.0::DOUBLE AS sp, 0.0::DOUBLE AS sn,
             0.0::DOUBLE AS mp, 0.0::DOUBLE AS mn, 0 AS alarm
      FROM prep2 WHERE sd > 0
      UNION ALL
      SELECT event_type, ys, n, mu, sd, t + 1,
             greatest(0.0, sp + (ys[t + 1] - mu) / sd - 0.5),
             greatest(0.0, sn - (ys[t + 1] - mu) / sd - 0.5),
             greatest(mp, greatest(0.0, sp + (ys[t + 1] - mu) / sd
                                         - 0.5)),
             greatest(mn, greatest(0.0, sn - (ys[t + 1] - mu) / sd
                                         - 0.5)),
             CASE WHEN alarm > 0 THEN alarm
                  WHEN greatest(0.0, sp + (ys[t + 1] - mu) / sd - 0.5)
                         > 4.0
                    OR greatest(0.0, sn - (ys[t + 1] - mu) / sd - 0.5)
                         > 4.0
                  THEN t + 1 ELSE 0 END
      FROM rec WHERE t < n
    ),
    fin AS (SELECT * FROM rec WHERE t = n)
    SELECT p.event_type,
           p.n::BIGINT AS n_days,
           round(p.mu, 6) AS baseline_mean,
           CASE WHEN p.sd > 0 THEN round(p.sd, 6) END AS baseline_sd,
           CASE WHEN p.sd > 0 THEN round(f.mp, 6) END AS max_cusum_pos,
           CASE WHEN p.sd > 0 THEN round(f.mn, 6) END AS max_cusum_neg,
           CASE WHEN p.sd > 0 AND f.alarm > 0 THEN f.alarm END::INT
             AS alarm_day,
           CASE WHEN p.sd > 0 THEN f.alarm > 0 END AS alarmed
    FROM prep2 p LEFT JOIN fin f USING (event_type)
    ORDER BY p.event_type
    """,
)
def x13_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 — two-sided CUSUM drift alarm per event type (round 10):
    the Page (1954) control chart a training pipeline puts on its
    daily metric streams — standardize each post-baseline day against
    the first 14, accumulate S+/S− with reference value k = 0.5σ, and
    alarm when either side crosses h = 4σ: the sequential test that
    catches small persistent shifts per-day thresholds miss. Series
    values are 6dp-rounded and the recursion is a fixed IEEE op
    sequence with binary-exact k (the Holt-Winters convention), so
    max S+/S− and the integer alarm day replay identically in the
    recursive-CTE oracle. The whole recursion runs in ONE F.aggregate
    — zero per-step jobs
    (operators/timeseries.py:cusum_changepoint)."""
    from vectordb_migrator_spark.operators.timeseries import (
        cusum_changepoint,
    )

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    return cusum_changepoint(
        daily, "v", time_col="day", group_cols=["event_type"],
        baseline=14, k=0.5, h=4.0,
    )


@query(
    "x6_jpeg_thumbnail",
    """
    WITH dims AS (
      SELECT doc_id,
             (8 * (1 + doc_id % 3) + doc_id % 5)::INT AS w,
             (8 * (1 + doc_id % 2) + doc_id % 3)::INT AS h
      FROM documents
    ),
    g AS (
      SELECT xs.range AS bx, ys.range AS by
      FROM range(0, 4) xs, range(0, 3) ys
    ),
    blocks AS (
      SELECT d.doc_id, d.w, d.h,
             ((37 * g.bx + 59 * g.by + d.doc_id) % 256)::BIGINT AS v
      FROM dims d JOIN g ON 8 * g.bx < d.w AND 8 * g.by < d.h
    )
    SELECT doc_id,
           ceil(max(w) / 8.0)::INT AS thumb_w,
           ceil(max(h) / 8.0)::INT AS thumb_h,
           1::INT AS n_components,
           sum(v)::BIGINT AS sum_r,
           sum(v)::BIGINT AS sum_g,
           sum(v)::BIGINT AS sum_b,
           (doc_id % 256)::INT AS px00_r,
           (doc_id % 256)::INT AS px00_g,
           (doc_id % 256)::INT AS px00_b
    FROM blocks GROUP BY doc_id ORDER BY doc_id
    """,
)
def x6_jpeg_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — 1/8-scale JPEG thumbnails from DC coefficients (round
    10): the REAL library-free resize path for JPEG corpora — the DC
    term is 8x the block mean, so the preview falls out of the
    entropy decode with no IDCT and no full-resolution pixels (at
    100 TB: previews without materializing the corpus). Same
    block-constant gray fixtures as x6_jpeg_decode (restart intervals
    rotated), where each thumb pixel equals the planted block value
    exactly, so the oracle is a direct block-grid sum
    (operators/multimodal.py:jpeg_thumbnail_features)."""
    from vectordb_migrator_spark.operators.multimodal import (
        JPEG_THUMB_SCHEMA,
        fused_fixture_features,
        jpeg_thumb_row,
    )

    def make_payload(d: int) -> bytes:
        import numpy as np

        from vectordb_migrator_spark.operators.multimodal import jpeg_encode

        w = 8 * (1 + d % 3) + d % 5
        h = 8 * (1 + d % 2) + d % 3
        px = np.empty((h, w), np.uint8)
        for by in range(-(-h // 8)):
            for bx in range(-(-w // 8)):
                px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    37 * bx + 59 * by + d
                ) % 256
        return jpeg_encode(px, restart_interval=d % 4)

    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        make_payload,
        jpeg_thumb_row,
        JPEG_THUMB_SCHEMA,
    ).orderBy("doc_id")


@query(
    "x7_ks_two_sample",
    """
    WITH base AS (
      SELECT event_type, value::DOUBLE AS v,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a
      FROM events WHERE value IS NOT NULL
    ),
    tie AS (
      SELECT event_type, v,
             sum(a)::BIGINT AS ca,
             sum(1 - a)::BIGINT AS cb
      FROM base GROUP BY 1, 2
    ),
    stepped AS (
      SELECT event_type,
             sum(ca) OVER (PARTITION BY event_type ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum_a,
             sum(cb) OVER (PARTITION BY event_type ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum_b,
             sum(ca) OVER (PARTITION BY event_type) AS n1,
             sum(cb) OVER (PARTITION BY event_type) AS n2
      FROM tie
    ),
    agg AS (
      SELECT event_type,
             max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2,
             max(abs(n2 * cum_a - n1 * cum_b))::BIGINT AS d_num
      FROM stepped GROUP BY 1
    )
    SELECT event_type, n1, n2,
           CASE WHEN n1 > 0 AND n2 > 0 THEN d_num END AS d_num,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN round(d_num::DOUBLE / (n1::DOUBLE * n2::DOUBLE), 6)
                END AS d,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN round(d_num::DOUBLE / (n1::DOUBLE * n2::DOUBLE)
                           * sqrt(n1::DOUBLE * n2::DOUBLE
                                  / (n1 + n2)::DOUBLE), 6)
                END AS lambda,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN round(d_num::DOUBLE / (n1::DOUBLE * n2::DOUBLE)
                           * sqrt(n1::DOUBLE * n2::DOUBLE
                                  / (n1 + n2)::DOUBLE), 6) > 1.358102
                END AS significant
    FROM agg ORDER BY event_type
    """,
)
def x7_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — two-sample Kolmogorov–Smirnov test per event type (round
    10): the shape-sensitive companion to x7_mann_whitney — U detects
    location shifts, D = sup|F1−F2| detects ANY distributional
    difference (variance, tails, bimodality). The supremum is the
    exact integer |n2·cum1 − n1·cum2| over tie-collapsed pooled order
    statistics (cross-multiplied ECDFs, no division inside the max),
    so D's numerator is int64 on both engines; only the final D and
    the Smirnov λ run in IEEE doubles. Same A/B split as the U test
    (operators/scale.py:ks_two_sample_report)."""
    from vectordb_migrator_spark.operators.scale import (
        ks_two_sample_report,
    )

    return ks_two_sample_report(
        _t(spark, sf_dir, "events"),
        "value",
        group_cols=["event_type"],
        split_expr=F.col("user_id") % 2 == 0,
    )


def _fl_sql() -> str:
    """Recursive-CTE DuckDB oracle for x10_facility_location: md5
    sample, exact int64 dot-product similarity matrix, and the greedy
    0-floored facility-location loop with smallest-ordinal ties."""
    fx = (
        "list_transform(nv, x -> (CASE WHEN x >= 0 "
        "THEN floor(x * 10000.0 + 0.5) ELSE -floor(-x * 10000.0 + 0.5) "
        "END)::BIGINT)"
    )
    return f"""
    WITH RECURSIVE samp AS MATERIALIZED (
      SELECT id, {fx} AS v FROM (
        SELECT id,
               CASE WHEN nrm = 0 THEN dv
                    ELSE list_transform(dv, x -> x / nrm) END AS nv
        FROM (
          SELECT vec_id AS id, embedding::DOUBLE[] AS dv,
                 sqrt(list_sum([ (embedding::DOUBLE[])[i + 1]
                                 * (embedding::DOUBLE[])[i + 1]
                                 for i in range(64) ])) AS nrm
          FROM embeddings))
      ORDER BY md5(id::VARCHAR || ':fl:7'), id LIMIT 128
    ),
    one AS (
      SELECT list(id ORDER BY id) AS ids, list(v ORDER BY id) AS vs
      FROM samp
    ),
    simm AS MATERIALIZED (
      SELECT ids, len(ids) AS n,
             [ list_sum([ vs[(t // len(ids)) + 1][c + 1]
                          * vs[(t % len(ids)) + 1][c + 1]
                          for c in range(64) ])::BIGINT
               for t in range(len(ids) * len(ids)) ] AS sims
      FROM one
    ),
    rec AS (
      SELECT ids, n, sims, 0 AS rk,
             []::INT[] AS sel, []::BIGINT[] AS gains,
             [ 0::BIGINT for _ in range(n) ] AS cov
      FROM simm
      UNION ALL
      SELECT ids, n, sims, rk + 1,
             sel || [bi::INT],
             gains || [bg],
             [ greatest(cov[j + 1], sims[j * n + bi + 1], 0::BIGINT)
               for j in range(n) ]
      FROM (
        SELECT *,
               list_max(gl) AS bg,
               [ c for c in range(n) if gl[c + 1] = list_max(gl) ][1]
                 AS bi
        FROM (
          SELECT *,
                 [ CASE WHEN list_contains(sel, c::INT)
                        THEN (-1)::BIGINT
                        ELSE list_sum([ greatest(0::BIGINT,
                                        sims[j * n + c + 1] - cov[j + 1])
                                        for j in range(n) ])::BIGINT
                   END for c in range(n) ] AS gl
          FROM rec WHERE rk < 8))
    ),
    fin AS (SELECT * FROM rec WHERE rk = 8)
    SELECT (g.i + 1)::BIGINT AS sel_rank,
           f.ids[f.sel[g.i + 1] + 1]::BIGINT AS vec_id,
           f.gains[g.i + 1] AS gain,
           list_sum(f.gains[1 : g.i + 1])::BIGINT AS objective
    FROM fin f, unnest(range(len(f.sel))) g(i)
    ORDER BY sel_rank
    """


@query("x10_facility_location", _fl_sql())
def x10_facility_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — greedy facility-location data selection (round 10): the
    classic submodular coverage maximizer behind CRAIG-style coreset
    and fine-tuning-data selection — repeatedly pick the point whose
    addition most increases Σ_j max(0, max_{s∈S} sim(j,s)); the 1−1/e
    greedy guarantee makes the selection defensible and the
    non-increasing marginal gains are the submodularity certificate
    the output carries. Complements x10_kcenter_coreset: k-center
    minimizes the worst gap (outliers), facility location maximizes
    total coverage (modes). md5 sample, exact int64 dot products,
    smallest-ordinal ties — the greedy trajectory replays bit-for-bit
    in a recursive-CTE oracle; whole loop in ONE F.aggregate
    (operators/clustering.py:facility_location_select)."""
    from vectordb_migrator_spark.operators.clustering import (
        facility_location_select,
    )

    return facility_location_select(
        _t(spark, sf_dir, "embeddings"), k=8, sample_size=128, seed=7
    )


def _j420_sql() -> str:
    """MCU-grid DuckDB oracle for x6_jpeg_420_decode: with MCU-constant
    RGB fixtures the whole 4:2:0 chain (RGB -> round/clamp YCbCr ->
    2x2 chroma average of four equal values -> entropy code -> decode
    -> replicate-upsample -> round/clamp RGB) is the same IEEE chain
    as 4:4:4, replayed per 16x16 MCU times its clipped pixel count."""
    rh = "(CASE WHEN ({x}) >= 0 THEN floor(({x}) + 0.5) ELSE -floor(-({x}) + 0.5) END)"
    cl = "least(greatest({x}, 0.0), 255.0)"

    def chain(expr):
        return cl.format(x=rh.format(x=expr))

    y = chain("0.299 * r + 0.587 * g + 0.114 * b")
    cb = chain("128 - 0.168736 * r - 0.331264 * g + 0.5 * b")
    cr = chain("128 + 0.5 * r - 0.418688 * g - 0.081312 * b")
    r2 = chain("y + 1.402 * (cr - 128)")
    g2 = chain("y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)")
    b2 = chain("y + 1.772 * (cb - 128)")
    return f"""
    WITH dims AS (
      SELECT doc_id,
             (16 * (1 + doc_id % 2) + doc_id % 9)::INT AS w,
             (16 * (1 + doc_id % 3) + doc_id % 5)::INT AS h
      FROM documents
    ),
    grid AS (
      SELECT xs.range AS mx, ys.range AS my
      FROM range(0, 3) xs, range(0, 4) ys
    ),
    mcus AS (
      SELECT d.doc_id, d.w, d.h, g.mx, g.my,
             ((37 * g.mx + 59 * g.my + d.doc_id) % 256)::DOUBLE AS r,
             ((17 * g.mx + 43 * g.my + 2 * d.doc_id + 7) % 256)::DOUBLE AS g,
             ((29 * g.mx + 31 * g.my + 3 * d.doc_id + 13) % 256)::DOUBLE AS b,
             (least(d.w, 16 * (g.mx + 1)) - 16 * g.mx)::BIGINT AS nx,
             (least(d.h, 16 * (g.my + 1)) - 16 * g.my)::BIGINT AS ny
      FROM dims d JOIN grid g ON 16 * g.mx < d.w AND 16 * g.my < d.h
    ),
    ycc AS (
      SELECT doc_id, w, h, mx, my, nx, ny,
             {y} AS y, {cb} AS cb, {cr} AS cr
      FROM mcus
    ),
    dec AS (
      SELECT doc_id, w, h, mx, my, nx, ny,
             {r2}::BIGINT AS dr, {g2}::BIGINT AS dg, {b2}::BIGINT AS db
      FROM ycc
    )
    SELECT doc_id,
           max(w) AS width, max(h) AS height,
           3::INT AS n_components,
           (max(w) * max(h))::BIGINT AS n_pixels,
           sum(dr * nx * ny)::BIGINT AS sum_r,
           sum(dg * nx * ny)::BIGINT AS sum_g,
           sum(db * nx * ny)::BIGINT AS sum_b,
           max(CASE WHEN mx = 0 AND my = 0 THEN dr END)::INT AS px00_r,
           max(CASE WHEN mx = 0 AND my = 0 THEN dg END)::INT AS px00_g,
           max(CASE WHEN mx = 0 AND my = 0 THEN db END)::INT AS px00_b
    FROM dec GROUP BY doc_id ORDER BY doc_id
    """


@query("x6_jpeg_420_decode", _j420_sql())
def x6_jpeg_420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — 4:2:0 chroma-subsampled JPEG decode (round 10): THE
    dominant real-world JPEG shape — each MCU interleaves four luma
    blocks with one Cb and one Cr covering a 16x16 region, chroma is
    2x2-averaged at encode and replicate-upsampled at decode.
    Fixtures plant MCU-CONSTANT RGB gradients with a unit quant
    table: the four chroma samples averaged per cell are equal, so
    the entire chain is the SAME reproducible IEEE arithmetic as
    4:4:4 and the oracle replays it per MCU times its clipped pixel
    count. Dims deliberately off the 16-grid exercise the luma-16 /
    chroma-8 edge padding and the upsample crop. One wrong interleave
    slot, DC predictor, or upsample offset moves the channel sums
    (operators/multimodal.py:jpeg_decode)."""
    from vectordb_migrator_spark.operators.multimodal import (
        JPEG_SCHEMA,
        fused_fixture_features,
        jpeg_feature_row,
    )

    def make_payload(d: int) -> bytes:
        import numpy as np

        from vectordb_migrator_spark.operators.multimodal import jpeg_encode

        w = 16 * (1 + d % 2) + d % 9
        h = 16 * (1 + d % 3) + d % 5
        px = np.empty((h, w, 3), np.uint8)
        for my in range(-(-h // 16)):
            for mx in range(-(-w // 16)):
                sl = (
                    slice(my * 16, my * 16 + 16),
                    slice(mx * 16, mx * 16 + 16),
                )
                px[sl[0], sl[1], 0] = (37 * mx + 59 * my + d) % 256
                px[sl[0], sl[1], 1] = (17 * mx + 43 * my + 2 * d + 7) % 256
                px[sl[0], sl[1], 2] = (29 * mx + 31 * my + 3 * d + 13) % 256
        return jpeg_encode(px, subsampling="420")

    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        make_payload,
        jpeg_feature_row,
        JPEG_SCHEMA,
    ).orderBy("doc_id")
