"""Registry family ``s13_round11`` — round-11 queries (progressive
JPEG decode, EXIF metadata tier, PQ-routed graph-ANN certificate,
fixed-point PC2 deflation, and later additions)."""

from __future__ import annotations

# ruff: noqa: E501
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_migrator_spark.suite._shared import (
    _t,
    query,
)


def _jprog_sql() -> str:
    """MCU-grid DuckDB oracle for x6_jpeg_progressive: the fixtures
    are MCU-constant 4:2:0 RGB, so — exactly as in the x6_jpeg_420
    oracle — every block is DC-only, the chroma 2x2 means average
    four equal values, and the whole encode/decode chain reduces to
    the reproducible IEEE round/clamp YCbCr round trip per MCU times
    its clipped pixel count. Progressive coding changes only HOW the
    coefficients are entropy-coded (spectral selection + successive
    approximation), never their values, so the oracle is the same
    block-grid arithmetic."""
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
             (16 * (1 + doc_id % 3) + doc_id % 7)::INT AS w,
             (16 * (1 + doc_id % 2) + doc_id % 11)::INT AS h
      FROM documents
    ),
    grid AS (
      SELECT xs.range AS mx, ys.range AS my
      FROM range(0, 4) xs, range(0, 3) ys
    ),
    mcus AS (
      SELECT d.doc_id, d.w, d.h, g.mx, g.my,
             ((41 * g.mx + 23 * g.my + 5 * d.doc_id) % 256)::DOUBLE AS r,
             ((13 * g.mx + 61 * g.my + 3 * d.doc_id + 11) % 256)::DOUBLE AS g,
             ((53 * g.mx + 19 * g.my + 7 * d.doc_id + 29) % 256)::DOUBLE AS b,
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


@query("x6_jpeg_progressive", _jprog_sql())
def x6_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — progressive (SOF2) JPEG decode (round 11): the one decode
    shape a real scraped web corpus hits that the round-10 baseline
    decoder still rejected. The decoder now accumulates coefficient
    bits across scans — DC first + refinement (interleaved MCU order),
    per-component AC spectral-selection scans with EOBn end-of-band
    runs and ZRL, and AC successive-approximation refinement with
    correction bits (T.81 G.2) — then runs the SAME dequant/IDCT/
    upsample tail as baseline. Fixtures are MCU-constant 4:2:0 RGB
    gradients encoded by jpeg_encode_progressive (a cjpeg-shaped scan
    script: DC Al=1, AC bands 1-5/6-63 at Al=2, two refinement passes,
    DC refine; restart_interval rotates doc_id % 4 so RSTn handling
    inside progressive scans gets driver evidence). Because
    progressive re-codes the SAME quantized coefficients, the decode
    is the same integer-exact chain the 4:2:0 oracle replays — one
    wrong EOB run, correction bit, or refinement placement moves the
    channel sums. The decoder is additionally pinned against a
    hand-assembled T.81 G.2 bitstream and a progressive==baseline
    Hypothesis property (operators/multimodal.py:jpeg_decode,
    _jpeg_progressive_scan)."""
    from vectordb_migrator_spark.operators.multimodal import (
        JPEG_SCHEMA,
        fused_fixture_features,
        jpeg_feature_row,
    )

    def make_payload(d: int) -> bytes:
        import numpy as np

        from vectordb_migrator_spark.operators.multimodal import (
            jpeg_encode_progressive,
        )

        w = 16 * (1 + d % 3) + d % 7
        h = 16 * (1 + d % 2) + d % 11
        px = np.empty((h, w, 3), np.uint8)
        for my in range(-(-h // 16)):
            for mx in range(-(-w // 16)):
                sl = (
                    slice(my * 16, my * 16 + 16),
                    slice(mx * 16, mx * 16 + 16),
                )
                px[sl[0], sl[1], 0] = (41 * mx + 23 * my + 5 * d) % 256
                px[sl[0], sl[1], 1] = (13 * mx + 61 * my + 3 * d + 11) % 256
                px[sl[0], sl[1], 2] = (53 * mx + 19 * my + 7 * d + 29) % 256
        return jpeg_encode_progressive(
            px, subsampling="420", restart_interval=d % 4
        )

    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        make_payload,
        jpeg_feature_row,
        JPEG_SCHEMA,
    ).orderBy("doc_id")


@query(
    "x6_jpeg_exif",
    """
    SELECT doc_id,
           (doc_id % 7 <> 0) AS has_exif,
           CASE WHEN doc_id % 7 <> 0 THEN
             (CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END)
           END AS byte_order,
           CASE WHEN doc_id % 7 <> 0 THEN (1 + doc_id % 8) END::INT
             AS orientation,
           CASE WHEN doc_id % 7 <> 0 THEN printf(
             '2020:03:%02d 12:%02d:00',
             (1 + doc_id % 28)::INT, (doc_id % 60)::INT
           ) END AS exif_datetime,
           CASE WHEN doc_id % 7 <> 0 THEN 'cam-' || (doc_id % 5)::VARCHAR
           END AS make,
           (doc_id % 3 = 0) AS icc_present,
           (8 * (1 + doc_id % 3))::INT AS width,
           (8 * (1 + doc_id % 2))::INT AS height,
           (doc_id % 5 = 0) AS progressive,
           NULL::DOUBLE AS gps_lat,
           NULL::DOUBLE AS gps_lon,
           NULL::INT AS thumb_offset,
           NULL::INT AS thumb_length
    FROM documents ORDER BY doc_id
    """,
)
def x6_jpeg_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — EXIF/APPn metadata tier (round 11): Exif byte order /
    Orientation / DateTime / Make out of APP1 IFD0 (both II and MM
    TIFF byte orders — fixtures alternate), ICC-profile presence from
    APP2, SOF dimensions and the progressive flag — all from a
    pure-bytes marker walk that reads ~1 KB per image and never
    entropy-decodes. On a real photo corpus this is the first
    curation pass: Orientation values 5-8 transpose the image (so
    thumbnail and perceptual-dedup geometry are wrong without it) and
    DateTime drives dedup windows / temporal splits. Fixtures splice
    hand-built APP1/APP2 segments into baseline AND progressive
    streams, with every-7th image Exif-less and every-3rd carrying
    ICC — one wrong endian read, IFD offset, or inline-vs-offset
    ASCII decision moves a column
    (operators/multimodal.py:jpeg_exif_meta)."""
    from vectordb_migrator_spark.operators.multimodal import (
        JPEG_EXIF_SCHEMA,
        fused_fixture_features,
        jpeg_exif_row,
    )

    def make_payload(d: int) -> bytes:
        import numpy as np

        from vectordb_migrator_spark.operators.multimodal import (
            exif_app1_segment,
            icc_app2_segment,
            jpeg_encode,
            jpeg_encode_progressive,
        )

        px = np.full((8 * (1 + d % 2), 8 * (1 + d % 3)), d % 256, np.uint8)
        enc = jpeg_encode_progressive if d % 5 == 0 else jpeg_encode
        jb = enc(px)
        extra = b""
        if d % 7 != 0:
            extra += exif_app1_segment(
                orientation=1 + d % 8,
                datetime=f"2020:03:{1 + d % 28:02d} 12:{d % 60:02d}:00",
                make=f"cam-{d % 5}",
                byte_order="II" if d % 2 == 0 else "MM",
            )
        if d % 3 == 0:
            extra += icc_app2_segment()
        return jb[:2] + extra + jb[2:]

    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        make_payload,
        jpeg_exif_row,
        JPEG_EXIF_SCHEMA,
    ).orderBy("doc_id")


def _jpt_sql() -> str:
    """Thumb-grid DuckDB oracle for x6_jpeg_progressive_thumb: on the
    MCU-constant 4:2:0 progressive fixtures every luma block is
    DC-only, so each 16x16 MCU contributes up to 2x2 thumbnail pixels
    of ONE color — the same IEEE YCbCr round-trip as the full-decode
    oracle, weighted by the MCU's clipped THUMB-pixel count."""
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
             (16 * (1 + doc_id % 3) + doc_id % 7)::INT AS w,
             (16 * (1 + doc_id % 2) + doc_id % 11)::INT AS h,
             ((16 * (1 + doc_id % 3) + doc_id % 7 + 7) // 8)::INT AS tw,
             ((16 * (1 + doc_id % 2) + doc_id % 11 + 7) // 8)::INT AS th
      FROM documents
    ),
    grid AS (
      SELECT xs.range AS mx, ys.range AS my
      FROM range(0, 4) xs, range(0, 3) ys
    ),
    mcus AS (
      SELECT d.doc_id, d.tw, d.th, g.mx, g.my,
             ((41 * g.mx + 23 * g.my + 5 * d.doc_id) % 256)::DOUBLE AS r,
             ((13 * g.mx + 61 * g.my + 3 * d.doc_id + 11) % 256)::DOUBLE AS g,
             ((53 * g.mx + 19 * g.my + 7 * d.doc_id + 29) % 256)::DOUBLE AS b,
             (least(d.tw, 2 * (g.mx + 1)) - 2 * g.mx)::BIGINT AS nx,
             (least(d.th, 2 * (g.my + 1)) - 2 * g.my)::BIGINT AS ny
      FROM dims d JOIN grid g ON 2 * g.mx < d.tw AND 2 * g.my < d.th
    ),
    ycc AS (
      SELECT doc_id, tw, th, mx, my, nx, ny,
             {y} AS y, {cb} AS cb, {cr} AS cr
      FROM mcus
    ),
    dec AS (
      SELECT doc_id, tw, th, mx, my, nx, ny,
             {r2}::BIGINT AS dr, {g2}::BIGINT AS dg, {b2}::BIGINT AS db
      FROM ycc
    )
    SELECT doc_id,
           max(tw) AS thumb_w, max(th) AS thumb_h,
           3::INT AS n_components,
           sum(dr * nx * ny)::BIGINT AS sum_r,
           sum(dg * nx * ny)::BIGINT AS sum_g,
           sum(db * nx * ny)::BIGINT AS sum_b,
           max(CASE WHEN mx = 0 AND my = 0 THEN dr END)::INT AS px00_r,
           max(CASE WHEN mx = 0 AND my = 0 THEN dg END)::INT AS px00_g,
           max(CASE WHEN mx = 0 AND my = 0 THEN db END)::INT AS px00_b
    FROM dec GROUP BY doc_id ORDER BY doc_id
    """


@query("x6_jpeg_progressive_thumb", _jpt_sql())
def x6_jpeg_progressive_thumb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — DC thumbnails from PROGRESSIVE streams (round 11): the
    pairing progressive encoding exists for — the DC coefficients
    arrive in the FIRST scan, so a 1/8-scale preview of a progressive
    corpus needs only the cheap scans, and `dc_only=True` skips IDCT
    and full-plane assembly exactly as on baseline. Same MCU-constant
    4:2:0 fixtures as x6_jpeg_progressive (restart intervals rotate),
    decoded through jpeg_thumbnail_features: the thumb grid is
    ceil(w/8)×ceil(h/8), each 16×16 MCU owns up to 2×2 thumb pixels
    of one color, and the oracle replays the IEEE chain per MCU times
    its clipped THUMB-pixel count. One wrong DC-refinement bit or
    upsample offset moves the sums
    (operators/multimodal.py:jpeg_decode dc_only + progressive)."""
    from vectordb_migrator_spark.operators.multimodal import (
        JPEG_THUMB_SCHEMA,
        fused_fixture_features,
        jpeg_thumb_row,
    )

    def make_payload(d: int) -> bytes:
        import numpy as np

        from vectordb_migrator_spark.operators.multimodal import (
            jpeg_encode_progressive,
        )

        w = 16 * (1 + d % 3) + d % 7
        h = 16 * (1 + d % 2) + d % 11
        px = np.empty((h, w, 3), np.uint8)
        for my in range(-(-h // 16)):
            for mx in range(-(-w // 16)):
                sl = (
                    slice(my * 16, my * 16 + 16),
                    slice(mx * 16, mx * 16 + 16),
                )
                px[sl[0], sl[1], 0] = (41 * mx + 23 * my + 5 * d) % 256
                px[sl[0], sl[1], 1] = (13 * mx + 61 * my + 3 * d + 11) % 256
                px[sl[0], sl[1], 2] = (53 * mx + 19 * my + 7 * d + 29) % 256
        return jpeg_encode_progressive(
            px, subsampling="420", restart_interval=d % 4
        )

    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        make_payload,
        jpeg_thumb_row,
        JPEG_THUMB_SCHEMA,
    ).orderBy("doc_id")


def _pqr_sql() -> str:
    """Hop-unrolled DuckDB oracle for x4_graph_pq_route: the md5
    sample, exact int64 k-NN graph, sampled PQ codebooks, per-node
    codes + ADC estimates, BOTH beam walks (exact- and ADC-ranked),
    the exact rerank of each final beam, and the visited accounting,
    all replayed in SQL."""
    fx = (
        "list_transform({col}, x -> (CASE WHEN x >= 0 THEN "
        "floor(x * 10000.0 + 0.5) ELSE -floor(-x * 10000.0 + 0.5) "
        "END)::BIGINT)"
    )
    d2 = (
        "list_sum([ ({a}[i+1] - {b}[i+1]) * ({a}[i+1] - {b}[i+1]) "
        "for i in range(64) ])::BIGINT"
    )
    sub2 = (
        "list_sum([ ({a}[ts.s*16+i+1] - {b}[ts.s*16+i+1]) * "
        "({a}[ts.s*16+i+1] - {b}[ts.s*16+i+1]) for i in range(16) "
        "])::BIGINT"
    )
    hop = """
    {n}{t} AS MATERIALIZED (
      SELECT id, qd, ad FROM (
        SELECT id, qd, ad,
               row_number() OVER (ORDER BY {rank}, id) AS rk
        FROM (
          SELECT DISTINCT id, qd, ad FROM (
            SELECT id, qd, ad FROM {n}{p}
            UNION ALL
            SELECT n.id, n.qd, n.ad
            FROM {n}{p} JOIN edges ed ON ed.src = {n}{p}.id
                        JOIN nodes n ON n.id = ed.dst))
      ) WHERE rk <= 12
    ),
    v{n}{t} AS MATERIALIZED (
      SELECT DISTINCT id FROM (
        SELECT id FROM v{n}{p}
        UNION ALL
        SELECT ed.dst AS id
        FROM {n}{p} JOIN edges ed ON ed.src = {n}{p}.id)
    )"""
    mode = """
    SELECT '{route}' AS route,
           (SELECT count(*) FROM samp)::BIGINT AS n_nodes,
           (SELECT count(*) FROM edges)::BIGINT AS n_edges,
           4::INT AS m,
           16::INT AS pq_k,
           12::BIGINT AS beam_width,
           4::BIGINT AS hops,
           (SELECT count(*) FROM v{n}4)::BIGINT AS n_visited,
           (SELECT count(*) FROM (
              SELECT id FROM (
                SELECT id, row_number() OVER (ORDER BY qd, id) AS rk
                FROM {n}4) WHERE rk <= 10) r
            JOIN truth USING (id))::BIGINT AS n_hits,
           round((SELECT count(*) FROM (
              SELECT id FROM (
                SELECT id, row_number() OVER (ORDER BY qd, id) AS rk
                FROM {n}4) WHERE rk <= 10) r
            JOIN truth USING (id)) / 10.0, 6) AS recall_at_k"""
    hops = "".join(
        "," + hop.format(n="e", t=t, p=t - 1, rank="qd")
        for t in range(1, 5)
    ) + "".join(
        "," + hop.format(n="q", t=t, p=t - 1, rank="ad")
        for t in range(1, 5)
    )
    modes = " UNION ALL ".join(
        (mode.format(route="exact", n="e"), mode.format(route="pq_adc", n="q"))
    )
    return f"""
    WITH p AS (
      SELECT {fx.format(col="(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)")} AS pv
    ),
    samp AS MATERIALIZED (
      SELECT vec_id AS id, {fx.format(col="embedding::DOUBLE[]")} AS v
      FROM embeddings
      ORDER BY md5(vec_id::VARCHAR || ':kg:7'), vec_id LIMIT 192
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
    cb AS MATERIALIZED (
      SELECT j, v FROM (
        SELECT row_number() OVER (
                 ORDER BY md5(id::VARCHAR || ':pqcb:7'), id) AS j, v
        FROM samp) WHERE j <= 16
    ),
    codes AS MATERIALIZED (
      SELECT id, s, j FROM (
        SELECT a.id, ts.s, c.j,
               row_number() OVER (PARTITION BY a.id, ts.s
                 ORDER BY {sub2.format(a="a.v", b="c.v")}, c.j) AS rk
        FROM samp a, cb c, range(0, 4) ts(s))
      WHERE rk = 1
    ),
    adct AS MATERIALIZED (
      SELECT c.j, ts.s, {sub2.format(a="p.pv", b="c.v")} AS d
      FROM cb c, range(0, 4) ts(s), p
    ),
    nodes AS MATERIALIZED (
      SELECT q.id, q.qd, a.ad
      FROM qd q JOIN (
        SELECT codes.id, sum(adct.d)::BIGINT AS ad
        FROM codes JOIN adct ON adct.s = codes.s AND adct.j = codes.j
        GROUP BY 1) a USING (id)
    ),
    e0 AS MATERIALIZED (
      SELECT id, qd, ad FROM nodes
      ORDER BY md5(id::VARCHAR || ':kgentry:7'), id LIMIT 2
    ),
    q0 AS (SELECT * FROM e0),
    ve0 AS (SELECT id FROM e0),
    vq0 AS (SELECT id FROM e0),
    truth AS MATERIALIZED (
      SELECT id FROM (
        SELECT id, row_number() OVER (ORDER BY qd, id) AS rk
        FROM nodes)
      WHERE rk <= 10
    ){hops}
    SELECT * FROM ({modes}) ORDER BY route
    """


@query("x4_graph_pq_route", _pqr_sql())
def x4_graph_pq_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — DiskANN-flavored hybrid routing certificate (round 11):
    beam search over the exact k-NN graph steered by PQ-ADC
    APPROXIMATE distances with an EXACT rerank of the final beam,
    side by side with the exact-routed twin at the same beam width —
    how every disk-resident graph index (DiskANN/Vamana, HNSW+PQ)
    actually runs at 100 TB: the walk reads in-memory PQ codes, only
    the final beam pays full-vector I/O. The two output rows isolate
    the recall cost of approximate steering from the graph itself.
    Deterministic end to end: md5 node sample, int64 fixed-point
    coordinates, codebooks = md5-salted sample rows, exact int64
    subvector argmin codes (lowest-index ties), int64 ADC table,
    id-ascending ranking ties — the hop-unrolled oracle replays
    codes, both trajectories, and the reranked top-k bit-for-bit
    (operators/similarity.py:graph_pq_route_recall)."""
    from vectordb_migrator_spark.operators.similarity import (
        graph_pq_route_recall,
    )
    from vectordb_migrator_spark.suite._shared import _probe_vector

    emb = _t(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    return graph_pq_route_recall(
        emb, probe, k=10, degree=6, beam_width=12, hops=4,
        n_entries=2, sample_size=192, m=4, pq_k=16, seed=7,
    )


@query(
    "x7_ks_binned",
    """
    WITH base AS (
      SELECT event_type,
             CASE WHEN value <= 5 THEN 1
                  WHEN value <= 10 THEN 2
                  WHEN value <= 20 THEN 3
                  WHEN value <= 40 THEN 4
                  WHEN value <= 80 THEN 5
                  WHEN value <= 160 THEN 6
                  WHEN value <= 320 THEN 7
                  ELSE 8 END AS bin,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a
      FROM events WHERE value IS NOT NULL
    ),
    cnt AS (
      SELECT event_type, bin,
             sum(a)::BIGINT AS ca,
             sum(1 - a)::BIGINT AS cb
      FROM base GROUP BY 1, 2
    ),
    stepped AS (
      SELECT event_type,
             sum(ca) OVER (PARTITION BY event_type ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS cum_a,
             sum(cb) OVER (PARTITION BY event_type ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS cum_b,
             sum(ca) OVER (PARTITION BY event_type) AS n1,
             sum(cb) OVER (PARTITION BY event_type) AS n2
      FROM cnt
    ),
    agg AS (
      SELECT event_type,
             max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2,
             max(abs(n2 * cum_a - n1 * cum_b))::BIGINT AS d_num
      FROM stepped GROUP BY 1
    )
    SELECT event_type, n1, n2, 8::INT AS n_bins,
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
def x7_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — binned-ECDF two-sample KS per event type (round 11): the
    KS variant a streaming pipeline can actually run — against fixed
    bin edges the sufficient statistic collapses to per-(group, bin)
    counts, mergeable by pure addition, which is what makes the
    bit-for-bit streaming twin (streaming/incremental.py:
    ks_binned_ingest/ks_over, runtime-tested against this operator)
    possible where the exact test's pooled order statistics are not.
    D = max over bin prefixes of the exact integer
    |n2·cum_a − n1·cum_b| (cross-multiplied binned ECDFs); binned D
    lower-bounds exact D, so the alarm is conservative. Same A/B
    split as the exact test, same fixed edges as a frozen reference
    window (operators/scale.py:ks_binned_report)."""
    from vectordb_migrator_spark.operators.scale import ks_binned_report

    return ks_binned_report(
        _t(spark, sf_dir, "events"),
        "value",
        edges=[5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0],
        group_cols=["event_type"],
        split_expr=F.col("user_id") % 2 == 0,
    )


@query(
    "x6_oriented_thumbnail",
    """
    WITH dims AS (
      SELECT doc_id,
             (8 * (1 + doc_id % 3) + doc_id % 5)::INT AS w,
             (8 * (1 + doc_id % 2) + doc_id % 3)::INT AS h,
             CASE WHEN doc_id % 7 <> 0 THEN (1 + doc_id % 8) END::INT AS o
      FROM documents
    ),
    t AS (
      SELECT doc_id, o,
             ((w + 7) // 8)::INT AS tw, ((h + 7) // 8)::INT AS th,
             coalesce(o, 1) AS oo
      FROM dims
    ),
    t2 AS (
      SELECT *,
             CASE WHEN oo IN (2, 3, 7, 8) THEN tw - 1 ELSE 0 END AS cbx,
             CASE WHEN oo IN (3, 4, 6, 7) THEN th - 1 ELSE 0 END AS cby
      FROM t
    ),
    g AS (
      SELECT xs.range AS bx, ys.range AS by
      FROM range(0, 4) xs, range(0, 3) ys
    ),
    cells AS (
      SELECT t2.doc_id, t2.o, t2.oo, t2.tw, t2.th, t2.cbx, t2.cby,
             g.bx, g.by,
             ((37 * g.bx + 59 * g.by + t2.doc_id) % 256)::BIGINT AS v
      FROM t2 JOIN g ON g.bx < t2.tw AND g.by < t2.th
    )
    SELECT doc_id,
           max(o) AS orientation,
           (CASE WHEN max(oo) >= 5 THEN max(th) ELSE max(tw) END)::INT
             AS thumb_w,
           (CASE WHEN max(oo) >= 5 THEN max(tw) ELSE max(th) END)::INT
             AS thumb_h,
           sum(v)::BIGINT AS sum_r,
           sum(v)::BIGINT AS sum_g,
           sum(v)::BIGINT AS sum_b,
           max(CASE WHEN bx = cbx AND by = cby THEN v END)::INT AS px00_r,
           max(CASE WHEN bx = cbx AND by = cby THEN v END)::INT AS px00_g,
           max(CASE WHEN bx = cbx AND by = cby THEN v END)::INT AS px00_b
    FROM cells GROUP BY doc_id ORDER BY doc_id
    """,
)
def x6_oriented_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — orientation-corrected DC thumbnails (round 11): the
    composition a real photo pipeline runs before any perceptual
    hashing — parse Exif Orientation from APP1, decode the 1/8-scale
    DC preview, apply the orientation isometry. Orientations 5-8
    TRANSPOSE the image (phone photos: a quarter of real corpora), so
    ahash/dedup geometry computed on the raw decode is simply wrong
    without this step. Fixtures: block-constant gray gradients (thumb
    pixel == planted block value, integer-exact) with spliced APP1
    orientations rotating 1-8 and every 7th image Exif-less
    (identity). The oracle checks the THREE discriminating facts per
    image: dims swap exactly for o>=5, channel sums are invariant
    under the isometry, and WHICH corner block lands at px00 is the
    orientation semantics — one wrong flip/transpose moves it
    (operators/multimodal.py:jpeg_oriented_thumbnail_features,
    apply_exif_orientation)."""
    from vectordb_migrator_spark.operators.multimodal import (
        JPEG_ORIENTED_THUMB_SCHEMA,
        fused_fixture_features,
        jpeg_oriented_thumb_row,
    )

    def make_payload(d: int) -> bytes:
        import numpy as np

        from vectordb_migrator_spark.operators.multimodal import (
            exif_app1_segment,
            jpeg_encode,
        )

        w = 8 * (1 + d % 3) + d % 5
        h = 8 * (1 + d % 2) + d % 3
        px = np.empty((h, w), np.uint8)
        for by in range(-(-h // 8)):
            for bx in range(-(-w // 8)):
                px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    37 * bx + 59 * by + d
                ) % 256
        jb = jpeg_encode(px)
        if d % 7 != 0:
            app1 = exif_app1_segment(
                orientation=1 + d % 8,
                byte_order="II" if d % 2 == 0 else "MM",
            )
            jb = jb[:2] + app1 + jb[2:]
        return jb

    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        make_payload,
        jpeg_oriented_thumb_row,
        JPEG_ORIENTED_THUMB_SCHEMA,
    ).orderBy("doc_id")


@query(
    "x10_neyman_allocation",
    """
    WITH base AS (
      SELECT event_type AS stratum,
             (CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
                   ELSE -floor(-value * 100.0 + 0.5) END)::BIGINT AS q
      FROM events WHERE value IS NOT NULL
    ),
    stats AS (
      SELECT stratum, count(*)::BIGINT AS n_rows,
             sum(q)::BIGINT AS sx, sum(q * q)::BIGINT AS sxx
      FROM base GROUP BY 1
    ),
    wts AS (
      SELECT stratum, n_rows,
             floor(sqrt((n_rows * sxx - sx * sx)::DOUBLE))::BIGINT
               AS weight
      FROM stats
    ),
    quo AS (
      SELECT *, sum(weight) OVER () AS t, weight * 1000 AS bw FROM wts
    ),
    quo2 AS (
      SELECT stratum, n_rows, weight, t,
             CASE WHEN t > 0
                  THEN ((bw - bw % t) / t)::BIGINT END AS base,
             CASE WHEN t > 0 THEN bw % t END AS rem
      FROM quo
    ),
    fin AS (
      SELECT *, sum(base) OVER () AS spent,
             row_number() OVER (ORDER BY rem DESC, stratum) AS rk
      FROM quo2
    )
    SELECT stratum, n_rows, weight,
           (CASE WHEN t > 0 THEN base +
              (CASE WHEN rk <= 1000 - spent THEN 1 ELSE 0 END)
            END)::BIGINT AS alloc,
           round((CASE WHEN t > 0 THEN base +
              (CASE WHEN rk <= 1000 - spent THEN 1 ELSE 0 END)
            END)::DOUBLE / 1000.0, 6) AS share
    FROM fin ORDER BY stratum
    """,
)
def x10_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — Neyman-optimal stratified sampling allocation with
    Hamilton largest-remainder rounding (round 11): the budget-split
    every balanced-sampling curation step needs — n_h ∝ N_h·S_h, so
    big uniform strata get FEWER samples than small noisy ones, and
    the integer allocations sum EXACTLY to the budget (floors +
    leftovers to the largest remainders, ties by stratum). Weight =
    floor(sqrt(n·Σq² − (Σq)²)) over int64-quantized values — exact
    integer sufficient statistics with the one IEEE-correctly-rounded
    sqrt both engines share; quota floors use exact integer division.
    One wrong remainder rank or floor moves an alloc
    (operators/scale.py:neyman_allocation)."""
    from vectordb_migrator_spark.operators.scale import (
        neyman_allocation,
    )

    return neyman_allocation(
        _t(spark, sf_dir, "events"),
        "value",
        stratum_col="event_type",
        budget=1000,
        scale=100,
    )


@query(
    "x0_decontamination",
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
    ev AS (
      SELECT DISTINCT unnest(g) AS gram FROM sh WHERE id % 50 = 0
    ),
    train AS (
      SELECT id, len(g)::BIGINT AS n_shingles, unnest(g) AS gram
      FROM sh WHERE id % 50 <> 0
    ),
    hits AS (
      SELECT t.id, any_value(t.n_shingles) AS n_shingles,
             count(ev.gram)::BIGINT AS n_hit
      FROM train t LEFT JOIN ev ON t.gram = ev.gram
      GROUP BY t.id
    )
    SELECT id AS doc_id, n_shingles, n_hit,
           CASE WHEN n_shingles > 0
                THEN round(n_hit::DOUBLE / n_shingles::DOUBLE, 6)
                END AS containment,
           CASE WHEN n_shingles > 0
                THEN round(n_hit::DOUBLE / n_shingles::DOUBLE, 6)
                     >= 0.05
                END AS contaminated
    FROM hits ORDER BY doc_id
    """,
)
def x0_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X0 — eval-set decontamination scan (round 11): the GPT-3-style
    n-gram overlap filter run before every serious training job —
    documents whose word-trigram containment against the held-out
    benchmark set crosses the threshold are flagged (even partial
    leakage inflates evals). The benchmark here is the planted
    every-50th document; the remaining corpus is scanned once, the
    benchmark shingle set broadcasts (the 100 TB shape: the eval set
    is a dim table). Shingling is the library convention shared with
    the MinHash/Jaccard family, so the oracle reuses the established
    DuckDB shingle CTE verbatim
    (operators/dedup.py:decontamination_report)."""
    from vectordb_migrator_spark.operators.dedup import (
        decontamination_report,
    )

    docs = _t(spark, sf_dir, "documents")
    return decontamination_report(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        n=3,
        threshold=0.05,
    )


@query(
    "x5_ngram_novelty",
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
      SELECT id, len(g)::BIGINT AS n_shingles, unnest(g) AS gram
      FROM sh
    ),
    first AS (
      SELECT gram, min(id) AS first_id FROM ex GROUP BY 1
    )
    SELECT ex.id AS doc_id,
           any_value(ex.n_shingles) AS n_shingles,
           sum(CASE WHEN f.first_id = ex.id THEN 1 ELSE 0 END)::BIGINT
             AS n_novel,
           CASE WHEN any_value(ex.n_shingles) > 0 THEN
             round(sum(CASE WHEN f.first_id = ex.id THEN 1 ELSE 0
                       END)::DOUBLE
                   / any_value(ex.n_shingles)::DOUBLE, 6)
           END AS novelty
    FROM ex JOIN first f USING (gram)
    GROUP BY ex.id ORDER BY doc_id
    """,
)
def x5_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — per-document n-gram novelty (round 11): with documents in
    id (arrival) order, the fraction of each document's distinct
    trigrams that NO earlier document contains — the
    corpus-redundancy / memorization-pressure diagnostic ("how much
    new text is this crawl adding"). Two map-side-combinable
    aggregations over the dedup family's shingle side-table
    (first-occurrence doc per gram, then per-doc novel counts); the
    text never shuffles (operators/dedup.py:ngram_novelty_report)."""
    from vectordb_migrator_spark.operators.dedup import (
        ngram_novelty_report,
    )

    return ngram_novelty_report(_t(spark, sf_dir, "documents"), n=3)


@query(
    "x10_temperature_mixing",
    """
    WITH counts AS (
      SELECT lang AS domain, count(*)::BIGINT AS n_docs
      FROM documents GROUP BY 1
    ),
    wts AS (
      SELECT r.root, c.domain, c.n_docs,
             floor(
               (CASE r.root
                  WHEN 1 THEN n_docs::DOUBLE
                  WHEN 2 THEN sqrt(n_docs::DOUBLE)
                  ELSE sqrt(sqrt(n_docs::DOUBLE)) END) * 1000000.0
             )::BIGINT AS weight_q
      FROM counts c, (VALUES (1), (2), (4)) r(root)
    ),
    quo AS (
      SELECT *, sum(weight_q) OVER (PARTITION BY root) AS t,
             weight_q * 10000 AS bw
      FROM wts
    ),
    quo2 AS (
      SELECT root, domain, n_docs, weight_q, t,
             CASE WHEN t > 0
                  THEN ((bw - bw % t) / t)::BIGINT END AS base,
             CASE WHEN t > 0 THEN bw % t END AS rem
      FROM quo
    ),
    fin AS (
      SELECT *, sum(base) OVER (PARTITION BY root) AS spent,
             row_number() OVER (PARTITION BY root
                                ORDER BY rem DESC, domain) AS rk
      FROM quo2
    )
    SELECT root::INT AS root, domain, n_docs, weight_q,
           (CASE WHEN t > 0 THEN base +
              (CASE WHEN rk <= 10000 - spent THEN 1 ELSE 0 END)
            END)::BIGINT AS alloc,
           round((CASE WHEN t > 0 THEN base +
              (CASE WHEN rk <= 10000 - spent THEN 1 ELSE 0 END)
            END)::DOUBLE / 10000.0, 6) AS share
    FROM fin ORDER BY root, domain
    """,
)
def x10_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — temperature-scaled domain mixing (round 11): the
    sampling table every multilingual / multi-domain LLM run
    publishes (mT5's p_i ∝ n_i^(1/τ)) — proportional sampling starves
    small domains, uniform drowns big ones, the temperature knob
    interpolates. Domains = the documents language column; roots
    restricted to 1/2/4 so the weight chain is identity / sqrt /
    sqrt∘sqrt (IEEE-correctly-rounded on both engines, no
    transcendental pow); Hamilton apportionment (shared with
    x10_neyman_allocation) makes each root's allocations sum to the
    budget EXACTLY (operators/scale.py:temperature_mixing,
    hamilton_apportion)."""
    from vectordb_migrator_spark.operators.scale import (
        temperature_mixing,
    )

    return temperature_mixing(
        _t(spark, sf_dir, "documents"),
        domain_col="lang",
        roots=(1, 2, 4),
        budget=10_000,
    )


def _hll_sql() -> str:
    """DuckDB oracle for x7_hll_md5_overlap: the md5-register HLL
    (register = first 8 md5 bits, ρ from the next 60 via the same
    string arithmetic), the register-wise-max union merge, the
    bias-corrected estimator with the linear-counting branch, and the
    exact truths — replayed term for term."""
    alpha_m2 = repr(0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0)
    rho = """
             CASE WHEN length(stripped) = 0 THEN 61
                  ELSE (15 - length(stripped)) * 4 +
                       (CASE WHEN d = '1' THEN 3
                             WHEN d IN ('2', '3') THEN 2
                             WHEN d IN ('4', '5', '6', '7') THEN 1
                             ELSE 0 END) + 1 END"""
    est = """
      SELECT {keys}, count(*)::BIGINT AS n_regs,
             sum(1.0 / (1::BIGINT << m)) AS s_present
      FROM {src} GROUP BY {keys}"""
    fin = f"""
      SELECT {{keys}},
             CASE WHEN ({alpha_m2} / ((256 - n_regs) + s_present))
                       <= 640.0 AND (256 - n_regs) > 0
                  THEN 256.0 * ln(256.0 / (256 - n_regs)::DOUBLE)
                  ELSE {alpha_m2} / ((256 - n_regs) + s_present)
             END AS est
      FROM ({{agg}})"""
    return f"""
    WITH base AS MATERIALIZED (
      SELECT g, reg, v,
             {rho} AS rho
      FROM (
        SELECT event_type AS g,
               CAST(CONCAT('0x', substr(md5(user_id::VARCHAR), 1, 2))
                    AS BIGINT)::INT AS reg,
               user_id::VARCHAR AS v,
               regexp_replace(substr(md5(user_id::VARCHAR), 3, 15),
                              '^0+', '') AS stripped,
               substr(regexp_replace(
                 substr(md5(user_id::VARCHAR), 3, 15), '^0+', ''),
                 1, 1) AS d
        FROM events)
    ),
    regs AS MATERIALIZED (
      SELECT g, reg, max(rho) AS m FROM base GROUP BY 1, 2
    ),
    est_one AS (
      {fin.format(keys="g", agg=est.format(keys="g", src="regs"))}
    ),
    exact_one AS (
      SELECT g, count(DISTINCT v)::BIGINT AS exact FROM base GROUP BY 1
    ),
    pairs AS (
      SELECT a.g AS g_a, b.g AS g_b
      FROM (SELECT DISTINCT g FROM regs) a,
           (SELECT DISTINCT g FROM regs) b
      WHERE a.g < b.g
    ),
    u AS (
      SELECT p.g_a, p.g_b, r.reg, max(r.m) AS m
      FROM pairs p JOIN regs r ON r.g = p.g_a OR r.g = p.g_b
      GROUP BY 1, 2, 3
    ),
    est_u AS (
      {fin.format(keys="g_a, g_b",
                  agg=est.format(keys="g_a, g_b", src="u"))}
    ),
    exact_pair AS (
      SELECT a.g AS g_a, b.g AS g_b,
             count(*)::BIGINT AS exact_overlap
      FROM (SELECT DISTINCT g, v FROM base) a
      JOIN (SELECT DISTINCT g, v FROM base) b
        ON a.v = b.v AND a.g < b.g
      GROUP BY 1, 2
    )
    SELECT p.g_a, p.g_b,
           xa.exact AS exact_a, xb.exact AS exact_b,
           coalesce(xp.exact_overlap, 0)::BIGINT AS exact_overlap,
           round(ea.est, 6) AS est_a,
           round(eb.est, 6) AS est_b,
           round(eu.est, 6) AS est_union,
           round(ea.est + eb.est - eu.est, 6) AS est_overlap,
           round(abs(ea.est + eb.est - eu.est
                     - coalesce(xp.exact_overlap, 0)::DOUBLE), 6)
             AS abs_err
    FROM pairs p
    JOIN est_one ea ON ea.g = p.g_a
    JOIN est_one eb ON eb.g = p.g_b
    JOIN est_u eu USING (g_a, g_b)
    JOIN exact_one xa ON xa.g = p.g_a
    JOIN exact_one xb ON xb.g = p.g_b
    LEFT JOIN exact_pair xp USING (g_a, g_b)
    ORDER BY g_a, g_b
    """


@query("x7_hll_md5_overlap", _hll_sql())
def x7_hll_md5_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — audience overlap from DETERMINISTIC md5-register
    HyperLogLogs (round 11): the full-oracle twin of the rows-only
    Spark-sketch x7_audience_overlap, upgraded the way the md5-MinHash
    twin upgraded the MinHash family — register = first 8 md5 bits,
    ρ = leading zeros of the next 60 (string arithmetic both engines
    replay), union sketch = register-wise MAX (the mergeability HLL
    exists for), |A∩B| by inclusion-exclusion, with exact distincts
    alongside as the accuracy certificate. One pass builds all
    register maxima; pair estimates merge 256-row frames, never
    rescanning members (operators/sketches.py:
    hll_md5_overlap_report)."""
    from vectordb_migrator_spark.operators.sketches import (
        hll_md5_overlap_report,
    )

    return hll_md5_overlap_report(
        _t(spark, sf_dir, "events"), "user_id", group_col="event_type"
    )


def _benford_sql() -> str:
    """DuckDB oracle for x12_benford: the same nine literal Benford
    probabilities (embedded from one Python computation so both
    engines fold identical doubles), integer-cents leading digit via
    integer-to-string, and the chi-squared fold."""
    import math

    probs = [repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]
    plist = ", ".join(f"({d + 1}, {p})" for d, p in enumerate(probs))
    return f"""
    WITH counts AS (
      SELECT substr(floor(l_extendedprice * 100 + 0.5)::BIGINT::VARCHAR,
                    1, 1)::INT AS digit,
             count(*)::BIGINT AS n
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
        AND floor(l_extendedprice * 100 + 0.5)::BIGINT > 0
      GROUP BY 1
    ),
    digits AS (
      SELECT d.digit::INT AS digit, d.p::DOUBLE AS exp_share
      FROM (VALUES {plist}) d(digit, p)
    ),
    full_t AS (
      SELECT dg.digit, dg.exp_share, coalesce(c.n, 0)::BIGINT AS n
      FROM digits dg LEFT JOIN counts c USING (digit)
    ),
    staged AS (
      SELECT digit, n, sum(n) OVER () AS n_total,
             round(n::DOUBLE / (sum(n) OVER ())::DOUBLE, 6) AS obs_share,
             round(exp_share, 6) AS exp_share_r,
             (n::DOUBLE - (sum(n) OVER ())::DOUBLE * exp_share)
             * (n::DOUBLE - (sum(n) OVER ())::DOUBLE * exp_share)
             / ((sum(n) OVER ())::DOUBLE * exp_share) AS contrib
      FROM full_t
    )
    SELECT digit, n, n_total::BIGINT AS n_total, obs_share,
           exp_share_r AS exp_share,
           round(contrib, 6) AS chi2_contrib,
           round(sum(contrib) OVER (), 6) AS chi2,
           round(sum(contrib) OVER (), 6) > 15.507 AS suspicious
    FROM staged ORDER BY digit
    """


@query("x12_benford_chi2", _benford_sql())
def x12_benford_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 — Benford CHI-SQUARED audit (round 11): the formal test
    layer over the round-7 per-digit deviation audit (x12_benford) —
    same forensic screen, now with the df=8 chi-squared statistic,
    per-digit contributions that LOCALIZE the break, and the 5%
    critical-value flag, on a different money column (lineitem
    extended price vs order totals). It remains the
    classic fabricated-/degenerate-data screen for money-like
    columns — natural multi-magnitude amounts follow
    P(d) = log10(1+1/d); synthetic or truncated data does not, and
    the per-digit chi-squared contributions localize the break.
    Determinism: integer-cents leading digit via integer→string (the
    one string form engines agree on, unlike double formatting) and
    the nine Benford probabilities embedded as identical literal
    doubles on both sides (operators/validation.py:benford_report).
    TPC-H prices are uniform-ish, not Benford — the point of the
    audit row is the honest chi2, whatever it says."""
    from vectordb_migrator_spark.operators.validation import (
        benford_report,
    )

    return benford_report(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice"
    )


_FX_SQL = (
    "list_transform({col}, x -> (CASE WHEN x >= 0 THEN "
    "floor(x * 10000.0 + 0.5) ELSE -floor(-x * 10000.0 + 0.5) "
    "END)::BIGINT)"
)


def _lloyd_prologue(n_iter: int, k: int, d: int) -> str:
    """The shared unrolled-Lloyd WITH-prologue (m=1 instance of the
    proven x9_pq_learned_error template): fixed-point vectors,
    lowest-id seeds, and ``n_iter`` iterations of exact int64
    assignment (lowest-j ties) + exact integer half-away centroid
    averages with empty clusters keeping the previous codeword.
    Used by both x4_ivf_fp and x2_semdedup_fp; ends after cb{n_iter}
    (no trailing comma)."""
    iters = []
    for t in range(1, n_iter + 1):
        prev = f"cb{t - 1}"
        iters.append(f"""
    a{t} AS MATERIALIZED (
      SELECT sub.vec_id, sub.s, cb.j,
             list_sum([ (sub.sv[i] - cb.cw[i]) * (sub.sv[i] - cb.cw[i])
                        for i in range(1, {d + 1}) ]) AS dist
      FROM sub JOIN {prev} cb USING (s)
    ), w{t} AS MATERIALIZED (
      SELECT vec_id, s, j,
             row_number() OVER (PARTITION BY vec_id, s
                                ORDER BY dist, j) AS rn
      FROM a{t}
    ), u{t} AS MATERIALIZED (
      SELECT sub.s, w.j, g.i AS pos,
             sum(sub.sv[g.i]) AS ssum, count(*) AS n
      FROM sub
      JOIN w{t} w ON w.vec_id = sub.vec_id AND w.s = sub.s AND w.rn = 1
      CROSS JOIN range(1, {d + 1}) g(i)
      GROUP BY sub.s, w.j, g.i
    ), cb{t} AS MATERIALIZED (
      SELECT c.s, c.j, coalesce(u.cw, c.cw) AS cw
      FROM {prev} c LEFT JOIN (
        SELECT s, j,
               list((CASE WHEN ssum >= 0 THEN (2 * ssum + n) // (2 * n)
                          ELSE -((-2 * ssum + n) // (2 * n))
                     END)::BIGINT ORDER BY pos) AS cw
        FROM u{t} GROUP BY s, j
      ) u ON u.s = c.s AND u.j = c.j
    )""")
    return f"""
    WITH iv AS MATERIALIZED (
      SELECT vec_id, {_FX_SQL.format(col="embedding::DOUBLE[]")} AS iv
      FROM embeddings
    ), sub AS MATERIALIZED (
      SELECT vec_id, 0::INT AS s, iv AS sv FROM iv
    ), cb0 AS MATERIALIZED (
      SELECT 0::INT AS s, vec_id::INT AS j, iv AS cw
      FROM iv WHERE vec_id < {k}
    ),{",".join(iters)}"""


def _ivffp_sql(n_iter: int = 3, k: int = 8, d: int = 64) -> str:
    """Unrolled-Lloyd DuckDB oracle for x4_ivf_fp: the shared Lloyd
    prologue, then the IVF readout — probe-to-centroid routing,
    nprobe=2 cluster candidates, exact int64 top-10, brute-force hit
    flags."""
    fx = _FX_SQL
    return f"""{_lloyd_prologue(n_iter, k, d)}
    , p AS (
      SELECT {fx.format(col="(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)")} AS pv
    ), pd AS (
      SELECT cb.j,
             list_sum([ (p.pv[i] - cb.cw[i]) * (p.pv[i] - cb.cw[i])
                        for i in range(1, {d + 1}) ]) AS dist
      FROM cb{n_iter} cb, p
    ), pc AS (
      SELECT j FROM (
        SELECT j, row_number() OVER (ORDER BY dist, j) AS rn FROM pd)
      WHERE rn <= 2
    ), asg AS MATERIALIZED (
      SELECT vec_id, j FROM (
        SELECT a.vec_id, a.j,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY a.dist, a.j) AS rn
        FROM (
          SELECT sub.vec_id, cb.j,
                 list_sum([ (sub.sv[i] - cb.cw[i])
                            * (sub.sv[i] - cb.cw[i])
                            for i in range(1, {d + 1}) ]) AS dist
          FROM sub JOIN cb{n_iter} cb USING (s)) a)
      WHERE rn = 1
    ), d2t AS MATERIALIZED (
      SELECT iv.vec_id,
             list_sum([ (iv.iv[i] - p.pv[i]) * (iv.iv[i] - p.pv[i])
                        for i in range(1, {d + 1}) ])::BIGINT AS d2
      FROM iv, p
    ), exact AS (
      SELECT vec_id FROM (
        SELECT vec_id, row_number() OVER (ORDER BY d2, vec_id) AS rk
        FROM d2t)
      WHERE rk <= 10
    ), cand AS MATERIALIZED (
      SELECT d.vec_id, d.d2
      FROM d2t d JOIN asg USING (vec_id)
      WHERE asg.j IN (SELECT j FROM pc)
    )
    SELECT rk::BIGINT AS rank, vec_id, d2,
           vec_id IN (SELECT vec_id FROM exact) AS hit,
           (SELECT count(*) FROM cand)::BIGINT AS n_candidates
    FROM (
      SELECT vec_id, d2,
             row_number() OVER (ORDER BY d2, vec_id) AS rk
      FROM cand)
    WHERE rk <= 10 ORDER BY rank
    """


@query("x4_ivf_fp", _ivffp_sql())
def x4_ivf_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — ENGINE-EXACT IVF retrieval certificate (round 11): the
    fixed-point twin of the rows-only x4_kmeans_ivf, converted the
    way the integer Lloyd unroll converted PQ training — the coarse
    quantizer is pq_learned_codebooks_fp with ONE subspace (= plain
    k-means on the full vector, every quantity int64), assignment /
    probe routing / final ranking are exact integer distances with
    lowest-index ties, so the fitted centroids, the probed clusters,
    the candidate set, the top-10, and the brute-force hit flags all
    replay bit-for-bit in the unrolled-Lloyd oracle. n_candidates
    makes the IVF trade visible: the probe scanned a fraction of the
    corpus for the recall the hit column reports
    (operators/similarity.py:ivf_fp_certificate)."""
    from vectordb_migrator_spark.operators.similarity import (
        ivf_fp_certificate,
    )
    from vectordb_migrator_spark.suite._shared import _probe_vector

    emb = _t(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    return ivf_fp_certificate(
        emb, probe, k_clusters=8, nprobe=2, topk=10, n_iter=3,
    )


def _semfp_sql(
    n_iter: int = 3, k: int = 8, d: int = 64, threshold: float = 0.4
) -> str:
    """Unrolled-Lloyd DuckDB oracle for x2_semdedup_fp: the shared
    Lloyd prologue, exact int64 cluster assignment, the
    normalize→fix-point chain (the facility_location-proven
    fragments), and the SemDeDup drop rule on quantized cosines."""
    t_int = int(round(threshold * 10_000 * 10_000))
    return f"""{_lloyd_prologue(n_iter, k, d)}
    , asg AS MATERIALIZED (
      SELECT vec_id, j AS cluster FROM (
        SELECT a.vec_id, a.j,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY a.dist, a.j) AS rn
        FROM (
          SELECT sub.vec_id, cb.j,
                 list_sum([ (sub.sv[i] - cb.cw[i])
                            * (sub.sv[i] - cb.cw[i])
                            for i in range(1, {d + 1}) ]) AS dist
          FROM sub JOIN cb{n_iter} cb USING (s)) a)
      WHERE rn = 1
    ), nv_t AS MATERIALIZED (
      SELECT vec_id,
             {_FX_SQL.format(
                 col="(CASE WHEN nrm = 0 THEN dv "
                     "ELSE list_transform(dv, x -> x / nrm) END)")}
               AS nv
      FROM (
        SELECT vec_id, embedding::DOUBLE[] AS dv,
               sqrt(list_sum([ (embedding::DOUBLE[])[i + 1]
                               * (embedding::DOUBLE[])[i + 1]
                               for i in range({d}) ])) AS nrm
        FROM embeddings)
    ), n2 AS MATERIALIZED (
      SELECT a.vec_id, a.cluster, n.nv
      FROM asg a JOIN nv_t n USING (vec_id)
    ), losers AS (
      SELECT DISTINCT b.vec_id
      FROM n2 a JOIN n2 b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE list_sum([ a.nv[i + 1] * b.nv[i + 1]
                       for i in range({d}) ]) >= {t_int}
    )
    SELECT vec_id, cluster::INT AS cluster
    FROM asg
    WHERE vec_id NOT IN (SELECT vec_id FROM losers)
    ORDER BY vec_id
    """


@query("x2_semdedup_fp", _semfp_sql())
def x2_semdedup_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — ENGINE-EXACT SemDeDup (round 11): the fixed-point twin of
    the rows-only x2_semdedup_fitted, completing the integer-Lloyd
    conversion pattern (PQ training → IVF → SemDeDup): centroids from
    the m=1 fixed-point Lloyd fit, exact int64 assignment with
    lowest-index ties, and the SemDeDup keep rule (drop iff a
    same-cluster smaller-id row is cosine-similar above threshold) on
    QUANTIZED cosines — normalize with the fixed-order IEEE fold,
    fix-point at 1e4, int64 dot against an integer threshold. The
    fitted centroids, every pair decision, and the survivor set
    replay bit-for-bit in the unrolled-Lloyd oracle; the float
    semantic_dedup stays as the production operator
    (operators/dedup.py:semantic_dedup_fp)."""
    from vectordb_migrator_spark.operators.dedup import semantic_dedup_fp

    return semantic_dedup_fp(
        _t(spark, sf_dir, "embeddings"),
        k_clusters=8, n_iter=3, threshold=0.4,
    )


def _pd_sql() -> str:
    """Recursive-CTE DuckDB oracle for x9_power_deflation: the exact
    integer scatter + rescale, the PC1 power loop, the integer
    Hotelling deflation (T rescale by g2, denominator by g2², exact
    truncating divisions), the second rescale + power loop, and the
    final IEEE metric divisions — every integer operation mirrored."""
    fx = (
        "list_transform(embedding::DOUBLE[], x -> (CASE WHEN x >= 0 "
        "THEN floor(x * 100.0 + 0.5) ELSE -floor(-x * 100.0 + 0.5) "
        "END)::BIGINT)"
    )

    def sidiv(x, q):
        return (
            f"(CASE WHEN ({x}) >= 0 THEN ((({x}) - ({x}) % ({q})) / ({q}))"
            f" ELSE -(((-({x})) - (-({x})) % ({q})) / ({q})) END)::BIGINT"
        )

    power = """
    it{sfx} AS (
      SELECT 0 AS rk,
             [10000::BIGINT for _ in range(64)] AS prev,
             [10000::BIGINT for _ in range(64)] AS cur
      UNION ALL
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
          SELECT it{sfx}.rk, it{sfx}.prev, it{sfx}.cur,
                 [ list_sum([ m.{mat}[i * 64 + j + 1]
                              * it{sfx}.cur[j + 1]
                              for j in range(64) ])::BIGINT
                   for i in range(64) ] AS w
          FROM it{sfx}, {src} m WHERE it{sfx}.rk < 8))
    )"""
    tt = "(d3.t[(k // 64) + 1] * d3.t[(k % 64) + 1])"
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
             [ {sidiv("x", "g")} for x in c ] AS b
      FROM (
        SELECT n, c,
               greatest(1::BIGINT,
                        list_max(list_transform(c, x -> abs(x))) >> 18)
                 AS g
        FROM cmat)
    ),{power.format(sfx="", mat="b", src="bmat")},
    fin AS (
      SELECT cur AS v1 FROM it WHERE rk = 8
    ),
    defl AS (
      SELECT b.n, b.cmax, b.b, f.v1,
             [ list_sum([ b.b[i * 64 + j + 1] * f.v1[j + 1]
                          for j in range(64) ])::BIGINT
               for i in range(64) ] AS t0
      FROM bmat b, fin f
    ),
    d2 AS (
      SELECT *,
             greatest(1::BIGINT,
                      list_max(list_transform(t0, x -> abs(x))) >> 26)
               AS g2,
             list_sum([ v1[i + 1] * t0[i + 1]
                        for i in range(64) ])::BIGINT AS s
      FROM defl
    ),
    d3 AS (
      SELECT n, cmax, b, v1, s,
             [ {sidiv("x", "g2")} for x in t0 ] AS t,
             greatest(1::BIGINT,
                      ((s - s % (g2 * g2)) / (g2 * g2))::BIGINT) AS sg
      FROM d2
    ),
    c2m AS (
      SELECT n, cmax, b, v1, s,
             [ (d3.b[k + 1] - {sidiv(tt, "d3.sg")})::BIGINT
               for k in range(4096) ] AS c2
      FROM d3
    ),
    b2mat AS MATERIALIZED (
      SELECT n, cmax, b, v1, s,
             list_max(list_transform(c2, x -> abs(x))) AS c2max,
             [ {sidiv("x", "g3")} for x in c2 ] AS b2
      FROM (
        SELECT *,
               greatest(1::BIGINT,
                        list_max(list_transform(c2, x -> abs(x))) >> 18)
                 AS g3
        FROM c2m)
    ),{power.format(sfx="2", mat="b2", src="b2mat")},
    fin2 AS (
      SELECT prev AS p2, cur AS v2 FROM it2 WHERE rk = 8
    ),
    met AS (
      SELECT m.n, m.cmax, m.c2max, m.s,
             list_sum([ m.v1[i + 1] * m.v1[i + 1]
                        for i in range(64) ])::BIGINT AS v1v1,
             list_sum([ f.v2[i + 1] * f.v2[i + 1]
                        for i in range(64) ])::BIGINT AS v2v2,
             list_sum([ f.p2[i + 1] * f.p2[i + 1]
                        for i in range(64) ])::BIGINT AS p2p2,
             list_sum([ f.v2[i + 1] * f.p2[i + 1]
                        for i in range(64) ])::BIGINT AS v2p2,
             list_sum([ m.v1[i + 1] * f.v2[i + 1]
                        for i in range(64) ])::BIGINT AS v1v2,
             list_sum([ f.v2[i + 1] *
                        list_sum([ m.b[i * 64 + j + 1] * f.v2[j + 1]
                                   for j in range(64) ])
                        for i in range(64) ])::BIGINT AS v2bv2,
             list_sum([ m.b[i * 64 + i + 1]
                        for i in range(64) ])::BIGINT AS trace_b
      FROM b2mat m, fin2 f
    )
    SELECT n,
           64::INT AS d,
           8::INT AS iters,
           CASE WHEN cmax <= 0 THEN NULL
                ELSE round(s::DOUBLE / v1v1::DOUBLE / trace_b::DOUBLE,
                           6) END AS evr1,
           CASE WHEN cmax <= 0 OR c2max <= 0 THEN NULL
                ELSE round(v2bv2::DOUBLE / v2v2::DOUBLE
                           / trace_b::DOUBLE, 6) END AS evr2,
           CASE WHEN cmax <= 0 OR c2max <= 0 THEN NULL
                ELSE round(s::DOUBLE / v1v1::DOUBLE / trace_b::DOUBLE
                           + v2bv2::DOUBLE / v2v2::DOUBLE
                             / trace_b::DOUBLE, 6) END AS cum_evr,
           CASE WHEN cmax <= 0 OR c2max <= 0 THEN NULL
                ELSE round(v1v2::DOUBLE /
                           sqrt(v1v1::DOUBLE * v2v2::DOUBLE), 6)
                END AS ortho,
           CASE WHEN cmax <= 0 OR c2max <= 0 THEN NULL
                ELSE round(v2p2::DOUBLE /
                           sqrt(v2v2::DOUBLE * p2p2::DOUBLE), 6)
                END AS align2
    FROM met
    """


@query("x9_power_deflation", _pd_sql())
def x9_power_deflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — fixed-point deflation for PC2 (round 11): the r10
    verdict's ask — grow the engine-exact eigen family past PC1 by
    deflating the rescaled int64 scatter with the PC1 iterate
    (integer Hotelling: B − ⌊t·tᵀ/s_g⌋ with T = B·v₁ rescaled so
    every product stays inside 2⁵³) and power-iterating the deflated
    matrix, all inside ONE Catalyst expression on one row. Reports
    the PC1+PC2 explained-variance pair over the original scatter's
    trace, their cumulative sum, the iterate cosine (≈0 — the
    deflation certificate), and the PC2 convergence cosine. Every
    integer step (both power loops, both rescale gates, the
    truncating deflation divisions) replays bit-for-bit in the
    recursive-CTE oracle — the LAPACK-gauge caveat that keeps
    x9_pca_evr rows-only does not apply
    (operators/decomposition.py:power_iteration_pc2)."""
    from vectordb_migrator_spark.operators.decomposition import (
        power_iteration_pc2,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    return power_iteration_pc2(
        fan_out(_t(spark, sf_dir, "embeddings").select("embedding"))
    )
