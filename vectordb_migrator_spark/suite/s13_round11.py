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
        jpeg_decode_features,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    def gen(batches):
        import numpy as np
        import pandas as pd

        from vectordb_migrator_spark.operators.multimodal import (
            jpeg_encode_progressive,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
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
                        px[sl[0], sl[1], 1] = (
                            13 * mx + 61 * my + 3 * d + 11
                        ) % 256
                        px[sl[0], sl[1], 2] = (
                            53 * mx + 19 * my + 7 * d + 29
                        ) % 256
                rows.append(
                    {
                        "doc_id": d,
                        "payload": bytearray(
                            jpeg_encode_progressive(
                                px,
                                subsampling="420",
                                restart_interval=d % 4,
                            )
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    payloads = (
        fan_out(_t(spark, sf_dir, "documents").select("doc_id"))
        .mapInPandas(gen, schema="doc_id long, payload binary")
    )
    return jpeg_decode_features(payloads).orderBy("doc_id")


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
           (doc_id % 5 = 0) AS progressive
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
        jpeg_exif_features,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    def gen(batches):
        import numpy as np
        import pandas as pd

        from vectordb_migrator_spark.operators.multimodal import (
            exif_app1_segment,
            icc_app2_segment,
            jpeg_encode,
            jpeg_encode_progressive,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                px = np.full(
                    (8 * (1 + d % 2), 8 * (1 + d % 3)), d % 256, np.uint8
                )
                enc = (
                    jpeg_encode_progressive if d % 5 == 0 else jpeg_encode
                )
                jb = enc(px)
                extra = b""
                if d % 7 != 0:
                    extra += exif_app1_segment(
                        orientation=1 + d % 8,
                        datetime=(
                            f"2020:03:{1 + d % 28:02d} 12:{d % 60:02d}:00"
                        ),
                        make=f"cam-{d % 5}",
                        byte_order="II" if d % 2 == 0 else "MM",
                    )
                if d % 3 == 0:
                    extra += icc_app2_segment()
                rows.append(
                    {"doc_id": d, "payload": bytearray(jb[:2] + extra + jb[2:])}
                )
            yield pd.DataFrame(rows)

    payloads = (
        fan_out(_t(spark, sf_dir, "documents").select("doc_id"))
        .mapInPandas(gen, schema="doc_id long, payload binary")
    )
    return jpeg_exif_features(payloads).orderBy("doc_id")
