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
        jpeg_decode_features,
    )
    from vectordb_migrator_spark.operators.util import fan_out

    def gen(batches):
        import numpy as np
        import pandas as pd

        from vectordb_migrator_spark.operators.multimodal import jpeg_encode

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 8 * (1 + d % 3) + d % 5
                h = 8 * (1 + d % 2) + d % 3
                px = np.empty((h, w), np.uint8)
                for by in range(-(-h // 8)):
                    for bx in range(-(-w // 8)):
                        px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            37 * bx + 59 * by + d
                        ) % 256
                rows.append(
                    {
                        "doc_id": d,
                        "payload": bytearray(
                            jpeg_encode(px, restart_interval=d % 4)
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    payloads = (
        fan_out(_t(spark, sf_dir, "documents").select("doc_id"))
        .mapInPandas(gen, schema="doc_id long, payload binary")
    )
    return jpeg_decode_features(payloads).orderBy("doc_id")
