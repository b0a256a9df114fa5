"""Registry family ``s06_multimodal`` — split from the monolithic
suite.py (round 8); registration order preserved via the
package ``__init__`` import sequence."""

from __future__ import annotations

# ruff: noqa: E501
from vectordb_migrator_spark.suite._shared import (
    DataFrame,
    F,
    SparkSession,
    _t,
    attach_payload,
    extract_features,
    fake_decoder,
    np,
    pd,
    query,
)



# =====================================================================
# X6 — multimodal
# =====================================================================


def _x6_headers_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectordb_migrator_spark.operators.multimodal import (
        image_header_info,
    )

    doc = F.col("doc_id")
    w = (F.lit(100) + doc % 50).cast("long")
    h = (F.lit(50) + doc % 31).cast("long")

    def le16(v):
        return F.concat(
            F.lpad(F.hex(v % 256), 2, "0"),
            F.lpad(F.hex((v / 256).cast("long") % 256), 2, "0"),
        )

    def le32(v):
        return F.concat(le16(v), F.lit("0000"))

    png_hex = F.concat(
        F.lit("89504E470D0A1A0A" "0000000D" "49484452"),
        F.lpad(F.hex(w), 8, "0"),
        F.lpad(F.hex(h), 8, "0"),
    )
    gif_hex = F.concat(F.lit("474946383961"), le16(w), le16(h))
    bmp_hex = F.concat(
        F.lit("424D" + "00" * 12 + "28000000"), le32(w), le32(h)
    )
    payload = F.unhex(
        F.when(doc % 3 == 0, png_hex)
        .when(doc % 3 == 1, gif_hex)
        .otherwise(bmp_hex)
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", image_header_info(payload).alias("i"))
        .select(
            "doc_id",
            F.col("i.format").alias("format"),
            F.col("i.width").alias("width"),
            F.col("i.height").alias("height"),
        )
        .orderBy("doc_id")
    )


def bmp_gradient_payload(d: int) -> bytes:
    """One doc's 24-bit BMP gradient payload (blue = x, green = 3y,
    red = doc_id%256) — the per-row half of
    :func:`bmp_gradient_fixtures`, shared so real-decode queries can
    fuse fixture build and decode into one kernel."""
    import struct

    import numpy as np

    d = int(d)
    w = 15 + (d % 5) * 7
    h = 8 + (d % 3) * 4
    amp = d % 256
    stride = (w * 3 + 3) // 4 * 4
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(w)[None, :]  # b = x
    px[:, :, 1] = (3 * np.arange(h))[:, None]  # g = 3y
    px[:, :, 2] = amp  # r
    stored = px[::-1]  # bottom-up
    data = np.zeros((h, stride), dtype=np.uint8)
    data[:, : w * 3] = stored.reshape(h, w * 3)
    body = data.tobytes()
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return hdr + info + body


def bmp_gradient_fixtures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 24-bit BMP payloads with closed-form gradients
    (blue = x, green = 3y, red = doc_id%256) over widths exercising
    every 4-byte row-padding case and the bottom-up flip — the shared
    fixture frame for every real-decode query (x6_bmp_decode,
    x6_thumbnail)."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                [
                    {
                        "doc_id": int(d),
                        "payload": bytearray(bmp_gradient_payload(int(d))),
                    }
                    for d in pdf["doc_id"]
                ]
            )

    from vectordb_migrator_spark.operators.util import fan_out

    # fan out the single-row-group scan: the BMP synth + decode pair
    # is per-row Python work and would otherwise run as ONE task
    # (r12 x6_png_decode lesson; no-op on real multi-file corpora)
    return (
        fan_out(_t(spark, sf_dir, "documents").select("doc_id"))
        .mapInPandas(gen, schema="doc_id long, payload binary")
    )


@query(
    "x6_bmp_decode",
    """
    SELECT doc_id,
           (15 + (doc_id % 5) * 7)::INT AS width,
           (8 + (doc_id % 3) * 4)::INT AS height,
           ((15 + (doc_id % 5) * 7)
            * (8 + (doc_id % 3) * 4))::BIGINT AS n_pixels,
           (doc_id % 256)::DOUBLE AS mean_r,
           (3 * ((8 + (doc_id % 3) * 4) - 1) / 2.0)::DOUBLE AS mean_g,
           (((15 + (doc_id % 5) * 7) - 1) / 2.0)::DOUBLE AS mean_b,
           (doc_id % 256)::INT AS px00_r,
           0::INT AS px00_g,
           0::INT AS px00_b
    FROM documents ORDER BY doc_id
    """,
)
def x6_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — REAL image decode (round 7): uncompressed 24-bit BMP
    needs no codec, so this path decodes actual bytes end to end
    (struct header parse + vectorized NumPy reshape/flip inside an
    Arrow-batched ``mapInPandas`` kernel) — the image sibling of
    ``x6_wav_decode``. Fixtures plant per-doc gradients (blue = x,
    green = 3y, red = constant) across widths that exercise every
    4-byte row-padding case and the bottom-up row flip (the two
    classic BMP bugs — the top-left pixel read wrong exposes both);
    every feature is closed-form, so the real decode carries a full
    arithmetic oracle (operators/multimodal.py:bmp_decode_features)."""
    from vectordb_migrator_spark.operators.multimodal import (
        BMP_SCHEMA,
        bmp_feature_row,
        fused_fixture_features,
    )

    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        bmp_gradient_payload,
        bmp_feature_row,
        BMP_SCHEMA,
    ).orderBy("doc_id")


@query(
    "x6_wav_decode",
    """
    SELECT doc_id,
           8000::INT AS sample_rate, 1::INT AS channels,
           (1600 + (doc_id % 7) * 160)::BIGINT AS n_samples,
           ((1600 + (doc_id % 7) * 160) // 8)::BIGINT AS duration_ms,
           (1000 + (doc_id % 9) * 500)::DOUBLE AS rms,
           (1000 + (doc_id % 9) * 500)::BIGINT AS peak,
           ((1600 + (doc_id % 7) * 160 - 1)
            // (8 + (doc_id % 5) * 2))::BIGINT AS zero_crossings
    FROM documents ORDER BY doc_id
    """,
)
def x6_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — REAL audio decode (round 7): 16-bit PCM WAV needs no
    codec, so unlike the image/video stubs this path decodes actual
    bytes end to end (stdlib ``wave`` + NumPy inside an Arrow-batched
    ``mapInPandas`` kernel) and reports RMS / peak / zero-crossing /
    duration features. The fixture synthesizes a square wave per doc
    (half-period, amplitude, and length derived from doc_id), whose
    features are CLOSED-FORM — RMS = amplitude exactly, crossings =
    (n−1)//half — so the decode of real samples carries a full
    arithmetic oracle (operators/multimodal.py:wav_pcm_features)."""
    from vectordb_migrator_spark.operators.multimodal import (
        WAV_PCM_SCHEMA,
        fused_fixture_features,
        wav_feature_row,
    )

    def make_payload(d: int) -> bytes:
        import io
        import wave

        import numpy as np

        h = 8 + (d % 5) * 2
        amp = 1000 + (d % 9) * 500
        n = 1600 + (d % 7) * 160
        idx = np.arange(n)
        s = np.where((idx // h) % 2 == 0, amp, -amp).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(s.tobytes())
        return buf.getvalue()

    # fan out the single-row-group scan: WAV synth + decode is
    # per-row Python work (r12 x6_png_decode lesson; fan_out is a
    # no-op on real multi-file corpora)
    return fused_fixture_features(
        _t(spark, sf_dir, "documents").select("doc_id"),
        make_payload,
        wav_feature_row,
        WAV_PCM_SCHEMA,
    ).orderBy("doc_id")


@query(
    "x6_audio_headers",
    """
    SELECT doc_id,
           CASE doc_id % 2 WHEN 0 THEN 'wav' ELSE 'flac' END AS format,
           (8000 + (doc_id % 5) * 2000)::INT AS sample_rate,
           (1 + (doc_id % 4) // 2)::INT AS channels,
           16::INT AS bits,
           ((1000 + doc_id % 977) * 1000
            // (8000 + (doc_id % 5) * 2000))::BIGINT AS duration_ms
    FROM documents ORDER BY doc_id
    """,
)
def x6_audio_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — decoder-free AUDIO triage (round 7; the sound twin of
    ``x6_image_headers``): WAV (canonical RIFF layout, LE fields) and
    FLAC (STREAMINFO bit-unpacking) sample rate / channels / bit depth
    / exact integer-math duration read from ~40 header bytes in pure
    codegen — never the payload; compressed containers route to
    'unknown' for the decode tier. Payloads are synthesized
    header-accurately per doc (the container has no audio libs — the
    PARSER is the product, the fixture just exercises it; real WAV
    bytes from the stdlib encoder are parsed in
    tests/test_multimodal.py). Oracle recomputes the planted
    parameters arithmetically."""
    from vectordb_migrator_spark.operators.multimodal import (
        audio_header_info,
    )

    doc = F.col("doc_id")
    rate = (F.lit(8000) + (doc % 5) * 2000).cast("long")
    ch = (F.lit(1) + F.floor((doc % 4) / 2)).cast("long")
    nsamp = (F.lit(1000) + doc % 977).cast("long")
    data_size = nsamp * ch * 2

    def h2(v):
        return F.lpad(F.hex(v % 256), 2, "0")

    def le16(v):
        return F.concat(h2(v), h2(F.floor(v / 256).cast("long")))

    def le32(v):
        return F.concat(le16(v), F.lit("0000"))

    wav_hex = F.concat(
        F.lit("52494646"),
        le32(data_size + 36),
        F.lit("57415645666D7420"),
        F.lit("10000000" "0100"),
        le16(ch),
        le32(rate),
        le32(rate * ch * 2),
        le16(ch * 2),
        F.lit("1000"),
        F.lit("64617461"),
        le32(data_size),
    )
    flac_hex = F.concat(
        F.lit("664C6143" "80000022" "1000" "1000" "000000" "000000"),
        h2(F.shiftright(rate, 12)),
        h2(F.shiftright(rate, 4)),
        h2((rate % 16) * 16 + (ch - 1) * 2),
        F.lit("F0" "0000"),
        h2(F.shiftright(nsamp, 8)),
        h2(nsamp),
        F.lit("00" * 16),
    )
    payload = F.unhex(F.when(doc % 2 == 0, wav_hex).otherwise(flac_hex))
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", audio_header_info(payload).alias("i"))
        .select(
            "doc_id",
            F.col("i.format").alias("format"),
            F.col("i.sample_rate").alias("sample_rate"),
            F.col("i.channels").alias("channels"),
            F.col("i.bits").alias("bits"),
            F.col("i.duration_ms").alias("duration_ms"),
        )
        .orderBy("doc_id")
    )


@query(
    "x6_video_headers",
    """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'mp4' WHEN 1 THEN 'avi'
                ELSE 'ebml' END AS format,
           CASE WHEN doc_id % 3 = 0 THEN 'isom' END AS brand,
           (CASE WHEN doc_id % 3 = 1 THEN 320 + doc_id % 256 END)::INT
             AS width,
           (CASE WHEN doc_id % 3 = 1 THEN 240 + doc_id % 128 END)::INT
             AS height,
           (CASE doc_id % 3
              WHEN 0 THEN (10000 + doc_id % 9973) * 1000
                          // (600 + (doc_id % 4) * 300)
              WHEN 1 THEN (100 + doc_id % 900)
                          * (20000 + (doc_id % 5) * 10000) // 1000
            END)::BIGINT AS duration_ms
    FROM documents ORDER BY doc_id
    """,
)
def x6_video_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — decoder-free VIDEO container triage (round 7; completes
    the image/audio/video header family): MP4 major brand + mvhd
    duration (parsed only when the canonical faststart layout holds —
    ftyp→moov→mvhd v0, the web-encoder shape; dimensions live in tkhd
    and stay NULL for the decode tier), AVI width/height/frames →
    exact duration from fixed-offset RIFF fields, Matroska/WebM EBML
    magic detection. ~70 header bytes in pure codegen, never the
    payload. Payloads are synthesized header-accurately per doc (no
    video libs in the container — the PARSER is the product; box-walk
    edge cases incl. a NON-canonical mp4 layout are exercised on
    hand-built bytes in tests/test_multimodal.py). Oracle recomputes
    the planted parameters arithmetically
    (operators/multimodal.py:video_header_info)."""
    from vectordb_migrator_spark.operators.multimodal import (
        video_header_info,
    )

    doc = F.col("doc_id")
    ts = (F.lit(600) + (doc % 4) * 300).cast("long")
    dur_units = (F.lit(10000) + doc % 9973).cast("long")
    uspf = (F.lit(20000) + (doc % 5) * 10000).cast("long")
    frames = (F.lit(100) + doc % 900).cast("long")
    w_ = (F.lit(320) + doc % 256).cast("long")
    h_ = (F.lit(240) + doc % 128).cast("long")

    def h2(v):
        return F.lpad(F.hex(v % 256), 2, "0")

    def le16(v):
        return F.concat(h2(v), h2(F.floor(v / 256).cast("long")))

    def le32(v):
        return F.concat(le16(v), F.lit("0000"))

    def be32(v):
        return F.lpad(F.hex(v), 8, "0")

    mp4_hex = F.concat(
        F.lit("00000010" "66747970" "69736F6D" "00000000"),
        F.lit("00000074" "6D6F6F76"),
        F.lit("0000006C" "6D766864" "00" "000000"),
        F.lit("00000000" "00000000"),
        be32(ts),
        be32(dur_units),
    )
    avi_hex = F.concat(
        F.lit("52494646" "00000000" "415649204C495354"),
        F.lit("00000000" "6864726C" "61766968" "38000000"),
        le32(uspf),
        F.lit("00000000" "00000000" "00000000"),
        le32(frames),
        F.lit("00000000" "01000000" "00000000"),
        le32(w_),
        le32(h_),
    )
    ebml_hex = F.lit("1A45DFA3" + "00" * 8)
    payload = F.unhex(
        F.when(doc % 3 == 0, mp4_hex)
        .when(doc % 3 == 1, avi_hex)
        .otherwise(ebml_hex)
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", video_header_info(payload).alias("i"))
        .select(
            "doc_id",
            F.col("i.format").alias("format"),
            F.col("i.brand").alias("brand"),
            F.col("i.width").alias("width"),
            F.col("i.height").alias("height"),
            F.col("i.duration_ms").alias("duration_ms"),
        )
        .orderBy("doc_id")
    )


@query(
    "x6_image_headers",
    """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                ELSE 'bmp' END AS format,
           (100 + doc_id % 50)::INT AS width,
           (50 + doc_id % 31)::INT AS height
    FROM documents ORDER BY doc_id
    """,
)
def x6_image_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — binary image-header triage (round 6): real byte-layout
    parsing with NO decoder library — PNG (big-endian IHDR), GIF
    (little-endian logical screen), BMP (little-endian info header)
    dimensions read at SCAN SPEED in pure codegen
    (:func:`~vectordb_migrator_spark.operators.multimodal
    .image_header_info`; JPEG's variable-offset SOF goes through the
    Arrow-batched ``jpeg_dimensions`` scan instead). The query
    SYNTHESIZES valid headers in-engine (unhex of per-doc hex with
    deterministic dims), parses them back, and the oracle is the
    closed-form generator — a wrong parser hash-mismatches
    immediately. This is the triage step a 100 TB multimodal pipeline
    runs before spending decode: resolution filters, aspect buckets,
    and corrupt-header quarantine all read ~30 header bytes, never
    the payload."""
    return _x6_headers_impl(spark, sf_dir)


@query(
    "x6_multimodal_features",
    r"""
    SELECT doc_id, 'text' AS modality,
           octet_length(text::BLOB)::BIGINT AS n_bytes,
           list_reduce(list_prepend(0::BIGINT,
                         [ascii(c)::BIGINT for c in string_split(text, '')]),
                       (s, x) -> (s * 31 + x) % 1000000007) AS checksum
    FROM documents ORDER BY doc_id
    """,
)
def x6_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — binary payload plumbing: bytes + typed metadata through
    mapInPandas feature extraction (decode stubbed; deterministic fake
    decoder — ASCII text makes byte checksum == char rolling hash,
    which is what the oracle verifies)."""
    d = attach_payload(_t(spark, sf_dir, "documents"))
    feats = extract_features(d, decoder=fake_decoder)
    return feats.select(
        "doc_id", "modality", F.col("n_bytes").cast("long"), "checksum"
    ).orderBy("doc_id")


@query(
    "x6_frame_explode",
    """
    WITH f AS (
      SELECT doc_id, length(text) AS n,
             ceil(length(text) / 64.0)::INT AS nf
      FROM documents
    ), frames AS (
      SELECT doc_id,
             unnest([{'fid': i, 'part': substring(text, i*64 + 1, 64)}
                     for i in range(0, nf)]) AS u
      FROM f JOIN documents USING (doc_id) WHERE nf >= 1
    )
    SELECT doc_id, u.fid::INT AS frame_id,
           length(u.part)::INT AS frame_bytes,
           md5(u.part) AS frame_md5
    FROM frames ORDER BY doc_id, frame_id
    """,
)
def x6_frame_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — fixed-size frame split of the binary payload, pure codegen
    (sequence → substring → posexplode; no Python). The corpus is
    ASCII so the oracle's char-based split produces the same byte
    frames; md5 digests compare the actual frame contents."""
    from vectordb_migrator_spark.operators.multimodal import explode_frames

    d = attach_payload(_t(spark, sf_dir, "documents"))
    return (
        explode_frames(d, frame_size=64)
        .select(
            "doc_id",
            "frame_id",
            "frame_bytes",
            F.md5("frame").alias("frame_md5"),
        )
        .orderBy("doc_id", "frame_id")
    )


@query(
    "x6_frame_dedup",
    """
    WITH f AS (
      SELECT doc_id, length(text) AS n,
             ceil(length(text) / 64.0)::INT AS nf
      FROM documents
    ), frames AS (
      SELECT doc_id,
             unnest([{'fid': i, 'part': substring(text, i*64 + 1, 64)}
                     for i in range(0, nf)]) AS u
      FROM f JOIN documents USING (doc_id) WHERE nf >= 1
    )
    SELECT md5(u.part) AS frame_md5,
           count(DISTINCT doc_id)::BIGINT AS df,
           min(doc_id) AS keeper,
           count(*)::BIGINT AS n_occurrences
    FROM frames
    GROUP BY md5(u.part)
    HAVING count(DISTINCT doc_id) > 1
    ORDER BY frame_md5
    """,
)
def x6_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — cross-document repeated-FRAME detection (round 5): binary
    frames whose digest appears in more than one document, with the
    min-id keeper — the multimodal twin of span dedup (repeated video
    segments, watermark intros, shared audio stingers), running on
    digests so the 100 TB shuffle carries 16-byte hashes + ids, never
    frame bytes. One map-side-combinable (digest → df, keeper)
    shuffle over the codegen frame split."""
    from vectordb_migrator_spark.operators.multimodal import explode_frames

    d = attach_payload(_t(spark, sf_dir, "documents"))
    return (
        explode_frames(d, frame_size=64)
        .select("doc_id", F.md5("frame").alias("frame_md5"))
        .groupBy("frame_md5")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .filter(F.col("df") > 1)
        .orderBy("frame_md5")
    )
