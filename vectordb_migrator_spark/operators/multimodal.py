"""Multimodal columns (X6) — binary payloads with typed metadata.

Images/audio/video ride through the pipeline as opaque ``binary``
columns plus a metadata struct (modality, mime, width/height/duration).
The Spark-side plumbing — schema, Arrow batch shape, partition sizing —
is real and tested. Decode tiers (all stdlib+NumPy, no codec library):
16-bit PCM WAV (:func:`wav_pcm_features`), uncompressed BMP
(:func:`bmp_decode_features`), PNG inflate (:func:`png_decode_features`),
GIF LZW (:func:`gif_decode_features`), and baseline JPEG —
SOF0 Huffman + dequant + IDCT + YCbCr, :func:`jpeg_decode_features` —
are REAL and interop/spec-pinned; :func:`decode_image` dispatches
JPEG/BMP payloads to them. Only resize still needs an image library
(honest ``NotImplementedError``); :func:`fake_decoder` remains solely
as the deterministic stand-in for text-payload plumbing tests.

Scale notes: binary payloads dominate row size, so ops that don't need
bytes must never deserialize them — feature extraction projects the
payload column away as early as possible, and ``mapInPandas`` batch
size is bounded via ``spark.sql.execution.arrow.maxRecordsPerBatch``
to keep Arrow batches of large blobs inside executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Result schema of feature extraction — fixed so downstream ops are
#: schema-stable regardless of decoder.
FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, checksum long, feature array<float>"
)

_HASH_MOD = 1_000_000_007


def attach_payload(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    modality: str = "text",
) -> DataFrame:
    """Build a multimodal frame from the documents table: payload =
    utf-8 bytes of the text (a stand-in for image/audio bytes; the
    schema and flow are identical), metadata struct alongside."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ).alias("media_meta"),
    )


def fused_fixture_features(
    df: DataFrame,
    make_payload,
    feature_row,
    schema: str,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Build each doc's fixture payload AND extract its features in
    ONE ``mapInPandas`` kernel. The two-kernel shape (a generator
    ``mapInPandas`` emitting ``payload binary`` feeding a
    ``*_decode_features`` ``mapInPandas``) ships every encoded payload
    Python→JVM→Python through two separate Python runners; fusing
    crosses the boundary once with only ``doc_id`` in and the feature
    row out (guide §4.1 — pass only the columns the function needs).

    ``make_payload(doc_id) -> bytes`` and
    ``feature_row(doc_id, payload) -> dict`` are the extracted halves
    of the former two kernels, so the computed bytes and the decode
    are unchanged.

    The input is fanned out to FULL core width (not fan_out's
    cores/2 default): the fused encode+decode kernel is seconds of
    pure per-row CPU, where a measured 16→32-partition A/B halved the
    wall (4.35→2.25 s on the progressive corpus) — per-task scheduling
    overhead is noise next to the kernel. Width derives from
    ``defaultParallelism``, never a constant, and fan_out stays a
    no-op on already-wide scans (guide §2.5)."""
    from vectordb_migrator_spark.operators.util import fan_out

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    feature_row(int(d), make_payload(int(d)))
                    for d in pdf[id_col]
                ]
            )

    wide = fan_out(
        df.select(id_col),
        min_partitions=df.sparkSession.sparkContext.defaultParallelism,
    )
    # Materialize the feature rows before the caller's global orderBy:
    # a RangePartitioning exchange SAMPLES its child to pick bounds and
    # then recomputes it for the shuffle — two executions of the whole
    # encode+decode kernel (measured 4.5 s vs 2.5 s on the progressive
    # corpus). The checkpoint holds only the fixed-width feature rows
    # (never payloads), so the sort's sampling pass reads tiny
    # materialized rows instead of re-decoding the corpus (guide §3.3
    # plan-truncation note; same LogicalRDD pattern as the r13
    # x4_recall_report family base).
    return wide.mapInPandas(kernel, schema=schema).localCheckpoint(
        eager=True
    )


def _rolling_hash31(data: bytes, *, _chunk: int = 1 << 16) -> int:
    """Exact vectorized twin of the per-byte rolling hash
    ``h = (h * 31 + b) % _HASH_MOD``: chunked NumPy Horner — each
    chunk contributes ``h * 31^m + Σ b_i * 31^(m-1-i) (mod p)``.
    Bit-identical to the scalar loop (property-tested) but ~100×
    faster on decoded RGB buffers, where the interpreted loop used
    to dwarf the vectorized decode it hashed."""
    import numpy as np

    data = bytes(data)
    pw = _rolling_hash31._pw
    if pw is None:
        pw = np.empty(_chunk, dtype=np.int64)
        pw[0] = 1
        for j in range(1, _chunk):
            pw[j] = pw[j - 1] * 31 % _HASH_MOD
        _rolling_hash31._pw = pw
    h = 0
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    for s in range(0, len(arr), _chunk):
        seg = arr[s : s + _chunk]
        m = len(seg)
        # max term 255*(p-1) ≈ 2^38; 2^16 terms ≈ 2^54 < int64 max
        part = int((seg * pw[m - 1 :: -1]).sum() % _HASH_MOD)
        h = (h * pow(31, m, _HASH_MOD) + part) % _HASH_MOD
    return h


_rolling_hash31._pw = None


def decode_image(payload: bytes) -> dict:
    """REAL image decode dispatcher (round 10) — no longer a stub:
    JPEG payloads run the full baseline SOF0 pipeline
    (:func:`jpeg_decode`), BMP payloads the uncompressed walk
    (:func:`_bmp_pixels`); PNG/GIF have dedicated DataFrame-level
    decoders (:func:`png_decode_features` / :func:`gif_decode_features`).
    Returns the :func:`extract_features` contract: ``checksum`` = the
    rolling hash over the decoded RGB bytes (decode-sensitive: one
    wrong Huffman bit moves it) and a 4-dim ``feature`` of
    (width, height, n_components, mean luma). Non-image payloads
    raise ``ValueError`` — explicit, never silently wrong."""
    b = bytes(payload)
    if b[:2] == b"\xff\xd8":
        rgb, nc = jpeg_decode(b)
    elif b[:2] == b"BM":
        bgr = _bmp_pixels(b)
        if bgr is None:
            raise ValueError("unsupported or corrupt BMP payload")
        rgb = bgr[:, :, ::-1]
        nc = 3
    else:
        raise ValueError(
            "decode_image handles JPEG/BMP payloads; use "
            "png_decode_features / gif_decode_features for PNG/GIF, "
            "or pass an explicit decoder"
        )
    h, w = rgb.shape[:2]
    checksum = _rolling_hash31(rgb.tobytes())
    luma = (
        0.299 * float(rgb[:, :, 0].mean())
        + 0.587 * float(rgb[:, :, 1].mean())
        + 0.114 * float(rgb[:, :, 2].mean())
    )
    return {
        "checksum": checksum,
        "feature": [float(w), float(h), float(nc), luma],
    }


def fake_decoder(payload: bytes) -> dict:
    """Deterministic fake decode: rolling checksum + a 4-dim 'feature'
    derived from byte statistics. Stands in for decode→resize→embed so
    the distributed plumbing is testable and oracle-checkable."""
    checksum = _rolling_hash31(payload)
    n = len(payload) or 1
    return {
        "checksum": checksum,
        "feature": [
            float(n),
            float(payload[0] if payload else 0),
            float(payload[-1] if payload else 0),
            float(sum(payload) % 256),
        ],
    }


def extract_features(
    df: DataFrame, *, decoder=None, id_col: str = "doc_id"
) -> DataFrame:
    """Decode / feature-extract over Arrow batches (``mapInPandas``).

    Batch shape: the iterator yields pandas frames whose ``payload``
    column holds raw bytes; output conforms to FEATURE_SCHEMA. The
    default decoder is the REAL :func:`decode_image` (JPEG/BMP); it
    raises on non-image payloads — explicit rather than silently
    wrong.
    """
    dec = decoder or decode_image

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [dec(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "modality": [m["modality"] for m in pdf["media_meta"]],
                    "n_bytes": [int(m["n_bytes"]) for m in pdf["media_meta"]],
                    "checksum": [f["checksum"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return df.mapInPandas(_run, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, *, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: deterministic
    1-in-N selection by id hash (no data movement, pure filter).
    Sampling *before* decode is the scale-relevant part; see
    :func:`explode_frames` for the per-frame split itself."""
    return df.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(every_n)) == 0)


def explode_frames(
    df: DataFrame,
    *,
    frame_size: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split a binary payload into fixed-size frames — pure codegen
    (``sequence`` → ``substring`` → ``posexplode``), no Python and no
    UDF: a video-like blob becomes (id, frame_id, frame, n_bytes) rows
    entirely inside whole-stage codegen, so frame-level ops (sampling,
    per-frame decode) run on rows whose size is bounded by
    ``frame_size`` instead of whole payloads. The last frame may be
    short; empty payloads produce no frames.

    The ``sequence`` upper bound is guarded: Spark's ``sequence(0, n)``
    DESCENDS when n < 0, so an empty payload would otherwise produce
    two phantom frames rather than zero.
    """
    payload = F.col(payload_col)
    n_frames = F.ceil(F.octet_length(payload) / F.lit(frame_size)).cast("int")
    frames = F.when(
        n_frames >= 1,
        F.transform(
            F.sequence(F.lit(0), n_frames - 1),
            lambda i: F.substring(payload, i * frame_size + 1, frame_size),
        ),
    )
    other_cols = [c for c in df.columns if c != payload_col]
    return (
        df.select(*other_cols, F.posexplode(frames).alias("frame_id", "frame"))
        .withColumn("frame_bytes", F.octet_length("frame"))
    )


def fake_resizer(payload: bytes, target_bytes: int) -> bytes:
    """Deterministic fake resize: truncate or zero-pad to the target
    size — stands in for decode→resample→re-encode so the plumbing
    (schema, batch shape, metadata update) is testable."""
    return payload[:target_bytes].ljust(target_bytes, b"\0")


def resize_media(
    df: DataFrame,
    *,
    target_bytes: int,
    resizer=None,
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing over Arrow batches (``mapInPandas``): payload →
    resized payload with ``media_meta.n_bytes`` updated. Like
    :func:`decode_image`, the real resampler needs media libraries not
    present in this container — with no ``resizer`` supplied this
    raises ``NotImplementedError`` instead of being silently wrong;
    tests exercise :func:`fake_resizer`.
    """
    if resizer is None:
        raise NotImplementedError(
            "media resize requires an image/av library (PIL/opencv/ffmpeg); "
            "use fake_resizer for tests"
        )
    schema = df.schema

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [resizer(p, target_bytes) for p in pdf[payload_col]]
            pdf["media_meta"] = [
                {**dict(m), "n_bytes": target_bytes} for m in pdf["media_meta"]
            ]
            yield pdf

    return df.mapInPandas(_run, schema=schema)


def _be_int(payload: Column, start: int, n: int) -> Column:
    """Big-endian unsigned int from ``n`` bytes at 1-based ``start``."""
    return F.conv(F.hex(F.substring(payload, start, n)), 16, 10).cast("long")


def _le_int(payload: Column, start: int, n: int) -> Column:
    """Little-endian unsigned int from ``n`` bytes at 1-based
    ``start`` — per-byte extraction (hex() is big-endian)."""
    total = None
    for i in range(n):
        b = F.conv(F.hex(F.substring(payload, start + i, 1)), 16, 10).cast(
            "long"
        ) * F.lit(256**i)
        total = b if total is None else total + b
    return total


def image_header_info(payload: Column) -> Column:
    """Image format + dimensions parsed from the BINARY HEADER — no
    decoder, no external library, pure codegen byte inspection, so it
    runs at scan speed over billions of payloads (the triage step a
    multimodal pipeline runs BEFORE deciding what to decode):

    - PNG: 8-byte signature, then IHDR width/height as big-endian
      32-bit at bytes 17/21.
    - GIF (87a/89a): logical-screen width/height as little-endian
      16-bit at bytes 7/9.
    - BMP: 'BM' + BITMAPINFOHEADER width/height as little-endian
      32-bit at bytes 19/23.
    - anything else (including JPEG, whose dimensions live in a SOF
      marker at a variable offset): ``('unknown', NULL, NULL)`` — use
      :func:`jpeg_dimensions` for the marker-scan formats.

    Returns a struct column ``(format string, width int, height
    int)``."""
    sig8 = F.hex(F.substring(payload, 1, 8))
    sig6 = F.hex(F.substring(payload, 1, 6))
    sig2 = F.hex(F.substring(payload, 1, 2))

    def st(fmt, w, h):
        return F.struct(
            F.lit(fmt).alias("format"),
            w.cast("int").alias("width"),
            h.cast("int").alias("height"),
        )

    return (
        F.when(
            sig8 == "89504E470D0A1A0A",
            st("png", _be_int(payload, 17, 4), _be_int(payload, 21, 4)),
        )
        .when(
            sig6.isin("474946383961", "474946383761"),
            st("gif", _le_int(payload, 7, 2), _le_int(payload, 9, 2)),
        )
        .when(
            sig2 == "424D",
            st("bmp", _le_int(payload, 19, 4), _le_int(payload, 23, 4)),
        )
        .otherwise(
            F.struct(
                F.lit("unknown").alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
            )
        )
    )


def jpeg_dimensions(
    df: DataFrame,
    *,
    payload_col: str = "payload",
) -> DataFrame:
    """JPEG width/height via the SOF marker scan — the format whose
    dimensions live at a VARIABLE offset, so fixed-offset codegen
    (:func:`image_header_info`) cannot reach them. Arrow-batched
    ``mapInPandas`` walks the marker chain in plain bytes (SOI, then
    length-prefixed segments until SOF0..SOF15 excl. DHT/DAC/RST);
    ~30 header bytes inspected per image regardless of payload size.
    Appends ``jpeg_width``/``jpeg_height`` (NULL for non-JPEG or
    truncated headers); all other columns pass through."""
    from typing import Iterator as _It

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["jpeg_width int", "jpeg_height int"]
    )

    def dims(b: bytes):
        if len(b) < 4 or b[0:2] != b"\xff\xd8":
            return None, None
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                return None, None
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return w, h
            i += 2 + seg_len
        return None, None

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            pdf = pdf.copy()
            parsed = [dims(bytes(p)) for p in pdf[payload_col]]
            pdf["jpeg_width"] = [w for w, _ in parsed]
            pdf["jpeg_height"] = [h for _, h in parsed]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def _byte(payload: Column, pos: int) -> Column:
    """Unsigned byte value at 1-based ``pos``."""
    return F.conv(F.hex(F.substring(payload, pos, 1)), 16, 10).cast("long")


def audio_header_info(payload: Column) -> Column:
    """Audio format + stream parameters from the BINARY HEADER — the
    decoder-free triage twin of :func:`image_header_info` for sound:
    pure codegen byte inspection, scan-speed over billions of
    payloads, run BEFORE deciding what to decode.

    - WAV (canonical RIFF/WAVE with 'fmt ' at byte 13 and 'data' at
      byte 37 — the layout every PCM encoder writes; files with extra
      chunks fall to 'unknown' rather than mis-parse): channels LE16
      @23, sample rate LE32 @25, bits LE16 @35, data size LE32 @41;
      duration_ms = data_bytes·8000 / (rate·channels·bits), exact
      integer math.
    - FLAC: 'fLaC' + STREAMINFO (first metadata block, spec-fixed):
      sample rate 20 bits, channels 3 bits (+1), bits 5 bits (+1),
      total samples 36 bits, bit-unpacked from bytes 19-26;
      duration_ms = samples·1000 / rate.
    - anything else → ('unknown', NULLs) — compressed containers
      (MP3/OGG/M4A) need frame walks; triage routes them to the
      decode tier instead of guessing.

    Returns a struct ``(format string, sample_rate int, channels int,
    bits int, duration_ms long)``."""
    sig4 = F.hex(F.substring(payload, 1, 4))
    wave = F.hex(F.substring(payload, 9, 8))  # 'WAVEfmt '
    data = F.hex(F.substring(payload, 37, 4))  # 'data'

    # --- WAV ---
    w_ch = _le_int(payload, 23, 2)
    w_rate = _le_int(payload, 25, 4)
    w_bits = _le_int(payload, 35, 2)
    w_bytes = _le_int(payload, 41, 4)
    w_dur = F.floor(
        w_bytes * F.lit(8000) / (w_rate * w_ch * w_bits)
    ).cast("long")

    # --- FLAC STREAMINFO (bytes 19-26, 1-based) ---
    b = [_byte(payload, 19 + i) for i in range(8)]
    f_rate = b[0] * 4096 + b[1] * 16 + F.floor(b[2] / 16).cast("long")
    f_ch = F.floor(b[2] / 2).cast("long") % 8 + 1
    f_bits = (b[2] % 2) * 16 + F.floor(b[3] / 16).cast("long") + 1
    f_total = (
        (b[3] % 16) * F.lit(2**32)
        + b[4] * F.lit(2**24)
        + b[5] * F.lit(2**16)
        + b[6] * F.lit(2**8)
        + b[7]
    )
    f_dur = F.floor(f_total * F.lit(1000) / f_rate).cast("long")

    def st(fmt, rate, ch, bits, dur):
        return F.struct(
            F.lit(fmt).alias("format"),
            rate.cast("int").alias("sample_rate"),
            ch.cast("int").alias("channels"),
            bits.cast("int").alias("bits"),
            dur.cast("long").alias("duration_ms"),
        )

    return (
        F.when(
            (sig4 == "52494646")
            & (wave == "57415645666D7420")
            & (data == "64617461"),
            st("wav", w_rate, w_ch, w_bits, w_dur),
        )
        .when(
            sig4 == "664C6143",
            st("flac", f_rate, f_ch, f_bits, f_dur),
        )
        .otherwise(
            F.struct(
                F.lit("unknown").alias("format"),
                F.lit(None).cast("int").alias("sample_rate"),
                F.lit(None).cast("int").alias("channels"),
                F.lit(None).cast("int").alias("bits"),
                F.lit(None).cast("long").alias("duration_ms"),
            )
        )
    )


def _be_int_at(payload: Column, pos: Column, n: int) -> Column:
    """Big-endian unsigned int from ``n`` bytes at a DYNAMIC 1-based
    position column (``F.substr`` accepts column offsets)."""
    return F.conv(F.hex(F.substr(payload, pos, F.lit(n))), 16, 10).cast(
        "long"
    )


def video_header_info(payload: Column) -> Column:
    """Video container triage from the BINARY HEADER — the moving-
    picture twin of :func:`image_header_info` / :func:`audio_header_info`:
    pure codegen byte inspection (~70 bytes), scan-speed over billions
    of payloads, run BEFORE deciding what to route to the decode tier.

    - MP4 / ISO-BMFF: 'ftyp' box first (spec-mandated); emits the
      major brand (isom/mp42/avc1/... — the codec-family routing key).
      Duration comes from the mvhd timescale/duration pair WHEN the
      canonical faststart layout holds (moov immediately after ftyp,
      mvhd its first child, version 0) — the layout every
      web-optimized encoder writes; anything else leaves duration
      NULL rather than mis-parse a box walk. Dimensions live in tkhd
      (deeper walk) and stay NULL — triage routes to the decode tier.
    - AVI: canonical 'RIFF…AVI LIST…hdrlavih' layout; width/height/
      total-frames/µs-per-frame are fixed-offset LE32 fields;
      duration_ms = frames·µs_per_frame / 1000, exact integer math.
    - Matroska/WebM: EBML magic → ('ebml', NULLs) — EBML varint
      walks are decode-tier work.
    - anything else → ('unknown', NULLs).

    Returns a struct ``(format string, brand string, width int,
    height int, duration_ms long)``."""
    sig4 = F.hex(F.substring(payload, 1, 4))
    ftyp = F.hex(F.substring(payload, 5, 4)) == "66747970"
    avi = (
        (sig4 == "52494646")
        & (F.hex(F.substring(payload, 9, 8)) == "415649204C495354")
        & (F.hex(F.substring(payload, 21, 8)) == "6864726C61766968")
    )

    # --- MP4: ftyp size → canonical moov/mvhd probe ---
    p = _be_int(payload, 1, 4)
    brand = F.substring(payload, 9, 4).cast("string")
    moov_ok = (
        (F.hex(F.substr(payload, p + F.lit(5), F.lit(4))) == "6D6F6F76")
        & (F.hex(F.substr(payload, p + F.lit(13), F.lit(4))) == "6D766864")
        & (F.hex(F.substr(payload, p + F.lit(17), F.lit(1))) == "00")
    )
    m_ts = _be_int_at(payload, p + F.lit(29), 4)
    m_dur = _be_int_at(payload, p + F.lit(33), 4)
    mp4_dur = F.when(
        moov_ok & (m_ts > 0), F.floor(m_dur * F.lit(1000) / m_ts)
    ).cast("long")

    # --- AVI avih fixed-offset fields ---
    a_uspf = _le_int(payload, 33, 4)
    a_frames = _le_int(payload, 49, 4)
    a_w = _le_int(payload, 65, 4)
    a_h = _le_int(payload, 69, 4)
    a_dur = F.floor(a_frames * a_uspf / F.lit(1000)).cast("long")

    def st(fmt, br, w, h, dur):
        return F.struct(
            F.lit(fmt).alias("format"),
            br.alias("brand"),
            w.cast("int").alias("width"),
            h.cast("int").alias("height"),
            dur.cast("long").alias("duration_ms"),
        )

    null_s = F.lit(None).cast("string")
    null_i = F.lit(None).cast("long")
    return (
        F.when(ftyp, st("mp4", brand, null_i, null_i, mp4_dur))
        .when(avi, st("avi", null_s, a_w, a_h, a_dur))
        .when(sig4 == "1A45DFA3", st("ebml", null_s, null_i, null_i, null_i))
        .otherwise(st("unknown", null_s, null_i, null_i, null_i))
    )


WAV_PCM_SCHEMA = (
    "doc_id long, sample_rate int, channels int, n_samples long, "
    "duration_ms long, rms double, peak long, zero_crossings long"
)


def wav_pcm_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL audio decode for the one format that needs no codec:
    16-bit PCM WAV parses with the stdlib ``wave`` module and
    ``numpy.frombuffer`` — so unlike the ``decode_image`` stubs this
    path runs end-to-end in this container on actual bytes. Per file:
    sample rate, channels, sample/duration counts, RMS level, peak
    amplitude, and zero-crossing count (the crude pitch/energy
    features a dedup or silence-filter tier wants) from channel 0.

    Arrow-batched ``mapInPandas`` kernel — the sanctioned Python
    boundary: payloads stream through in bounded batches, each decode
    is pure NumPy (no per-sample Python), and only the fixed-width
    feature row leaves the executor. Undecodable payloads yield NULL
    features rather than failing the job (one corrupt blob must never
    kill a 100 TB pass)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    wav_feature_row(int(doc_id), bytes(payload))
                    for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
                ]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=WAV_PCM_SCHEMA
    )


def wav_feature_row(doc_id: int, payload: bytes) -> dict:
    """One WAV's feature row (the :func:`wav_pcm_features` kernel
    body) — exposed per-row so fixture queries can fuse payload build
    and decode into a single Python boundary crossing."""
    import io
    import wave

    import numpy as np

    row = {
        "doc_id": int(doc_id), "sample_rate": None,
        "channels": None, "n_samples": None,
        "duration_ms": None, "rms": None, "peak": None,
        "zero_crossings": None,
    }
    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            if w.getsampwidth() == 2:
                sr = w.getframerate()
                ch = w.getnchannels()
                n = w.getnframes()
                raw = np.frombuffer(w.readframes(n), dtype="<i2")
                s = raw[::ch].astype(np.float64)
                row.update(
                    sample_rate=sr,
                    channels=ch,
                    n_samples=int(s.size),
                    duration_ms=int(s.size * 1000 // sr),
                    rms=round(float(np.sqrt(np.mean(s * s))), 6)
                    if s.size
                    else None,
                    peak=int(np.max(np.abs(s))) if s.size else None,
                    zero_crossings=int(
                        np.count_nonzero(s[1:] * s[:-1] < 0)
                    )
                    if s.size > 1
                    else 0,
                )
    except Exception:  # noqa: BLE001 — corrupt blob -> NULLs
        pass
    return row


BMP_SCHEMA = (
    "doc_id long, width int, height int, n_pixels long, "
    "mean_r double, mean_g double, mean_b double, "
    "px00_r int, px00_g int, px00_b int"
)


def _bmp_pixels(payload):
    """Decode an uncompressed 24-bit BMP payload to an (h, w, 3)
    uint8 NumPy array in BGR order, top-down — or None for anything
    unsupported/corrupt (the shared real-decode core of
    :func:`bmp_decode_features` and :func:`thumbnail_features`).
    Handles the two classic BMP traps: 4-byte row padding and the
    bottom-up row order of positive-height files."""
    import struct

    import numpy as np

    try:
        b = bytes(payload)
        if b[:2] != b"BM" or len(b) < 54:
            return None
        off = struct.unpack_from("<I", b, 10)[0]
        w, h = struct.unpack_from("<ii", b, 18)
        _planes, bpp = struct.unpack_from("<HH", b, 26)
        comp = struct.unpack_from("<I", b, 30)[0]
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        flip = h > 0
        h = abs(h)
        stride = (w * 3 + 3) // 4 * 4
        data = np.frombuffer(
            b, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * 3]
        px = data.reshape(h, w, 3)  # BGR order
        return px[::-1] if flip else px
    except Exception:  # noqa: BLE001 — corrupt blob -> None
        return None


def bmp_decode_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image decode for the codec-free format: uncompressed
    24-bit BMP parses with ``struct`` + ``numpy.frombuffer`` — the
    image sibling of :func:`wav_pcm_features`, running end to end on
    actual bytes in this container. Per image: dimensions, per-channel
    means (the brightness/color-cast features an image-dedup or
    quality tier wants), and the TOP-LEFT pixel — which in BMP is the
    LAST stored row (bottom-up layout), so returning it correctly
    proves the decoder handles row order and the 4-byte row padding,
    the two classic BMP decode bugs.

    Arrow-batched ``mapInPandas``: each decode is vectorized NumPy
    (reshape with padded stride, flip, channel split — no per-pixel
    Python); undecodable or non-24bpp payloads yield NULL features
    instead of failing the pass."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    bmp_feature_row(int(doc_id), bytes(payload))
                    for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
                ]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=BMP_SCHEMA
    )


def bmp_feature_row(doc_id: int, payload: bytes) -> dict:
    """One BMP's feature row (the :func:`bmp_decode_features` kernel
    body) — exposed per-row so fixture queries can fuse payload build
    and decode into a single Python boundary crossing."""
    import numpy as np

    row = {
        "doc_id": int(doc_id), "width": None,
        "height": None, "n_pixels": None, "mean_r": None,
        "mean_g": None, "mean_b": None, "px00_r": None,
        "px00_g": None, "px00_b": None,
    }
    px = _bmp_pixels(payload)
    if px is not None:
        h, w = px.shape[:2]
        means = px.astype(np.float64).mean(axis=(0, 1))
        row.update(
            width=int(w), height=int(h),
            n_pixels=int(w) * int(h),
            mean_b=round(float(means[0]), 6),
            mean_g=round(float(means[1]), 6),
            mean_r=round(float(means[2]), 6),
            px00_b=int(px[0, 0, 0]),
            px00_g=int(px[0, 0, 1]),
            px00_r=int(px[0, 0, 2]),
        )
    return row


# ------------------------------------------------------------------ PNG

PNG_SCHEMA = (
    "doc_id long, width int, height int, channels int, n_pixels long, "
    "mean_r double, mean_g double, mean_b double, "
    "px00_r int, px00_g int, px00_b int"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> channel count for the supported 8-bit subset
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int):
    """Reverse the five PNG row filters (RFC 2083 §6) on the inflated
    scanline stream: each row is 1 filter byte + ``stride`` bytes.
    None/Up vectorize; Sub/Average/Paeth recur along x (rows here are
    image-width-sized — tiny next to the corpus)."""
    import numpy as np

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for yy in range(h):
        ft = raw[pos]
        pos += 1
        rec = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        if ft == 0:
            pass
        elif ft == 2:  # Up
            rec = (rec + prev) & 0xFF
        elif ft == 1:  # Sub — per-lane prefix sum mod 256
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad filter {ft}")
        out[yy] = rec.astype(np.uint8)
        prev = rec
    return out


def _png_filter_row(line, prev, bpp: int, ft: int):
    """FORWARD-filter one row (the encoder side of the five filters)
    — spec-pinned in tests against RFC 2083's difference formulas."""
    import numpy as np

    line = line.astype(np.int32)
    prev = prev.astype(np.int32)
    if ft == 0:
        return line.astype(np.uint8)
    if ft == 2:  # Up — fully vectorized
        return ((line - prev) & 0xFF).astype(np.uint8)
    if ft == 1:  # Sub — shift by bpp, vectorized
        out = line.copy()
        out[bpp:] = (line[bpp:] - line[:-bpp]) & 0xFF
        return out.astype(np.uint8)
    out = np.zeros_like(line)
    for x in range(len(line)):
        a = line[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[x] = (line[x] - pred) & 0xFF
    return out.astype(np.uint8)


def png_encode(px, *, color_type: int, row_filters=None) -> bytes:
    """Minimal REAL PNG encoder for fixtures and demos: 8-bit
    gray/gray+alpha/RGB/RGBA, non-interlaced, one IDAT. ``px`` is an
    (h, w, ch) or (h, w) uint8 array; ``row_filters`` optionally
    forces the filter byte per row (cycling fixtures through all five
    is how the decoder's unfilter paths get exercised on REAL
    streams). Chunk CRCs are real zlib.crc32 — any standards-
    compliant reader accepts the output."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if _PNG_CHANNELS.get(color_type) != ch:
        raise ValueError(f"color_type {color_type} needs "
                         f"{_PNG_CHANNELS.get(color_type)} channels, got {ch}")
    flat = px.reshape(h, w * ch)
    stream = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for yy in range(h):
        ft = int(row_filters[yy % len(row_filters)]) if row_filters else 0
        stream.append(ft)
        stream += _png_filter_row(flat[yy], prev, ch, ft).tobytes()
        prev = flat[yy]

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def png_decode_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL PNG decode (round 8) — the compressed-image tier the
    round-7 header triage stopped short of: PNG's only codec is
    zlib, which is stdlib, so the full pipeline (chunk walk → IDAT
    inflate → the five-filter unfilter → pixel stats) runs on actual
    bytes in this container. Supported: 8-bit gray / gray+alpha /
    RGB / RGBA, non-interlaced (the overwhelming majority of real
    PNGs); 16-bit, palette, and Adam7 payloads yield NULL features —
    never a misparse — as do corrupt streams.

    Features per image: dimensions, channel count, per-channel means
    (gray replicates to r=g=b; alpha excluded from means), and the
    top-left pixel — wrong unfiltering shows up there first. Same
    Arrow-batched ``mapInPandas`` shape as
    :func:`bmp_decode_features`; payload bytes never leave the
    executor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    png_feature_row(int(doc_id), bytes(payload))
                    for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
                ]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=PNG_SCHEMA
    )


def png_feature_row(doc_id: int, payload: bytes) -> dict:
    """One PNG's feature row (the :func:`png_decode_features` kernel
    body) — exposed per-row so fixture queries can fuse payload build
    and decode into a single Python boundary crossing."""
    import struct
    import zlib

    import numpy as np

    row = {
        "doc_id": int(doc_id), "width": None, "height": None,
        "channels": None, "n_pixels": None, "mean_r": None,
        "mean_g": None, "mean_b": None, "px00_r": None,
        "px00_g": None, "px00_b": None,
    }
    try:
        b = bytes(payload)
        if b[:8] == _PNG_SIG:
            pos, idat, ihdr = 8, bytearray(), None
            while pos + 8 <= len(b):
                ln = struct.unpack_from(">I", b, pos)[0]
                tag = b[pos + 4 : pos + 8]
                body = b[pos + 8 : pos + 8 + ln]
                pos += 12 + ln
                if tag == b"IHDR":
                    ihdr = struct.unpack(">IIBBBBB", body)
                elif tag == b"IDAT":
                    idat += body
                elif tag == b"IEND":
                    break
            if ihdr:
                w, h, depth, ct, comp, filt, inter = ihdr
                ch = _PNG_CHANNELS.get(ct)
                if (
                    ch and depth == 8 and comp == 0
                    and filt == 0 and inter == 0
                    and w > 0 and h > 0
                    and w * h <= 25_000_000
                ):
                    stride = w * ch
                    # cap the inflate at the expected scanline bytes: a
                    # crafted IDAT must not be able to balloon past the
                    # declared image (PNG-bomb guard); one extra byte
                    # makes oversize fail the length check below
                    # instead of passing truncated
                    raw = zlib.decompressobj().decompress(
                        bytes(idat), h * (stride + 1) + 1
                    )
                    if len(raw) == h * (stride + 1):
                        px = _png_unfilter(
                            raw, h, stride, ch
                        ).reshape(h, w, ch)
                        means = px.astype(np.float64).mean(
                            axis=(0, 1)
                        )
                        if ct in (0, 4):  # gray(+alpha)
                            r = g = bl = means[0]
                            p0 = [int(px[0, 0, 0])] * 3
                        else:
                            r, g, bl = means[0], means[1], means[2]
                            p0 = [int(px[0, 0, k]) for k in range(3)]
                        row.update(
                            width=int(w), height=int(h),
                            channels=int(ch),
                            n_pixels=int(w) * int(h),
                            mean_r=round(float(r), 6),
                            mean_g=round(float(g), 6),
                            mean_b=round(float(bl), 6),
                            px00_r=p0[0], px00_g=p0[1],
                            px00_b=p0[2],
                        )
    except Exception:  # noqa: BLE001 — corrupt blob -> NULLs
        pass
    return row


THUMB_SCHEMA = "doc_id long, tw int, th int, thumb_csv string"


def thumbnail_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    thumb: int = 4,
) -> DataFrame:
    """REAL image RESIZE on decoded pixels — the fingerprint step of
    every perceptual image-dedup pipeline (aHash/dHash start exactly
    here): decode the 24-bit BMP (shared :func:`_bmp_pixels` core),
    nearest-neighbor downsample to a ``thumb``×``thumb`` grid with the
    floor index map src = (dst·size)//thumb, and emit the full RGB
    grid as one comma-joined row-major string — every sampled pixel
    value and position is then oracle-checkable, not just a summary
    stat. Images smaller than the grid (or undecodable) yield NULLs.

    Arrow-batched ``mapInPandas``; the resize is one ``np.ix_`` fancy
    index per image (no per-pixel Python). At 100 TB this kernel is
    embarrassingly parallel — payloads never shuffle, the output is
    ~48 ints per image."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    thumbnail_row(int(doc_id), bytes(payload), thumb=thumb)
                    for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
                ]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=THUMB_SCHEMA
    )


def thumbnail_row(doc_id: int, payload: bytes, *, thumb: int = 4) -> dict:
    """One BMP's thumbnail row (the :func:`thumbnail_features` kernel
    body) — exposed per-row so fixture queries can fuse payload build
    and decode into a single Python boundary crossing."""
    import numpy as np

    row = {
        "doc_id": int(doc_id),
        "tw": None,
        "th": None,
        "thumb_csv": None,
    }
    px = _bmp_pixels(payload)
    if px is not None:
        h, w = px.shape[:2]
        if w >= thumb and h >= thumb:
            xi = (np.arange(thumb) * w) // thumb
            yi = (np.arange(thumb) * h) // thumb
            tb = px[np.ix_(yi, xi)]  # (T, T, 3) BGR
            rgb = tb[:, :, ::-1].reshape(-1)  # row-major RGB
            row.update(
                tw=thumb,
                th=thumb,
                thumb_csv=",".join(str(int(v)) for v in rgb),
            )
    return row


AHASH_SCHEMA = "doc_id long, ahash string"


def ahash_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    thumb: int = 4,
) -> DataFrame:
    """Perceptual average-hash (aHash) over REAL decoded pixels — the
    classic image near-dup fingerprint: nearest-neighbor downsample
    to ``thumb``×``thumb`` (the :func:`thumbnail_features` floor map),
    per-cell gray = r+g+b (an integer SUM, not a float mean — no
    rounding to disagree about), bit = 1 iff cell·T² > Σgray (the
    integer-exact form of "cell above the mean"), read out row-major
    as a bit string. Equal strings = perceptually-similar candidates;
    the engine-exact integer pipeline means the hash — and therefore
    the cluster assignment — carries a full closed-form oracle.

    Same embarrassingly-parallel shape as the other decode kernels:
    Arrow-batched ``mapInPandas``, one fancy-index + one comparison
    per image, payloads never shuffle, output is one short string."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    ahash_row(int(doc_id), bytes(payload), thumb=thumb)
                    for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
                ]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=AHASH_SCHEMA
    )


def ahash_row(doc_id: int, payload: bytes, *, thumb: int = 4) -> dict:
    """One BMP's average-hash row (the :func:`ahash_features` kernel
    body) — exposed per-row so fixture queries can fuse payload build
    and decode into a single Python boundary crossing."""
    import numpy as np

    n_cells = thumb * thumb
    row = {"doc_id": int(doc_id), "ahash": None}
    px = _bmp_pixels(payload)
    if px is not None:
        h, w = px.shape[:2]
        if w >= thumb and h >= thumb:
            xi = (np.arange(thumb) * w) // thumb
            yi = (np.arange(thumb) * h) // thumb
            tb = px[np.ix_(yi, xi)].astype(np.int64)
            gray = tb.sum(axis=2).reshape(-1)  # r+g+b
            bits = (gray * n_cells) > gray.sum()
            row["ahash"] = "".join("1" if b else "0" for b in bits)
    return row


# ------------------------------------------------------------------- GIF
# Minimal REAL GIF87a codec: variable-width LZW per the GIF spec
# (Appendix F of GIF89a), LSB-first bit packing, 255-byte sub-blocks.
# The encoder exists for fixtures; the decoder is the operator.


class _LZWBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits an initial CLEAR, grows the code width
    when the next free code reaches 2**width (cap 12 bits, CLEAR +
    reset at table overflow), ends with EOI. Returns the packed code
    bytes (no sub-block framing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    wtr = _LZWBitWriter()

    def fresh():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    wtr.put(clear, width)
    cur: tuple = ()
    for sym in indices:
        sym = int(sym)
        cand = cur + (sym,)
        if cand in table:
            cur = cand
            continue
        wtr.put(table[cur], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code == (1 << 12) + 1:
            wtr.put(clear, width)
            table, next_code, width = fresh()
        cur = (sym,)
    if cur:
        wtr.put(table[cur], width)
        # the decoder performs one more add (+ growth check) after
        # reading this final data code; mirror it so EOI's width
        # matches what any spec decoder expects
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
    wtr.put(eoi, width)
    return wtr.flush()


def gif_lzw_decode(
    data: bytes, min_code_size: int, *, max_out: int | None = None
) -> list:
    """Inverse of :func:`gif_lzw_encode`, with the cScSc
    (code == next_code) special case. Raises on malformed streams,
    and — when ``max_out`` is given (callers know the expected pixel
    count) — on streams that expand past it: LZW amplifies up to
    ~4096x, so an uncapped decode of a crafted stream is a
    decompression bomb."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit cursor
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            raise ValueError("truncated LZW stream")
        v = 0
        for k in range(width):
            byte = data[(pos + k) >> 3]
            v |= ((byte >> ((pos + k) & 7)) & 1) << k
        pos += width
        return v

    out: list = []
    table: list = []
    width = min_code_size + 1
    prev: tuple | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)  # cScSc
            table.append(entry)
        else:
            raise ValueError("code beyond table")
        out.extend(entry)
        if max_out is not None and len(out) > max_out:
            raise ValueError("LZW output exceeds expected size")
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry


def gif_encode(indices, palette) -> bytes:
    """Minimal REAL GIF87a encoder for fixtures and demos: one image,
    global color table, real variable-width LZW, a comment extension
    (so decoders must skip extension blocks), 255-byte sub-block
    framing. ``indices`` is an (h, w) array of palette indices;
    ``palette`` a list of (r, g, b). Palette length must be a power
    of two in [2, 256]."""
    import struct

    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    n = len(palette)
    if n < 2 or n & (n - 1):
        raise ValueError("palette length must be a power of two >= 2")
    size_bits = n.bit_length() - 2  # field stores log2(n) - 1
    mcs = max(2, n.bit_length() - 1)  # LZW min code size
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (size_bits & 0x07), 0, 0])
    for r, g, b in palette:
        out += bytes([r & 0xFF, g & 0xFF, b & 0xFF])
    # comment extension: decoders must walk sub-blocks they ignore
    out += b"\x21\xfe\x07fixture\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(mcs)
    data = gif_lzw_encode(idx.reshape(-1), mcs)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def gif_decode_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL GIF decode (round 9) — the third real decode tier after
    BMP (uncompressed) and PNG (zlib): GIF's only codec is LZW, which
    needs no library at all, so the full pipeline — header walk,
    global color table, extension-block skip, sub-block reassembly,
    variable-width LZW decompress (CLEAR/EOI, code growth, the cScSc
    case), palette mapping, pixel stats — runs on actual compressed
    bytes. Supported: GIF87a/GIF89a, single non-interlaced image,
    global color table (the fixture shape and the dominant archival
    shape); interlaced or local-palette images yield NULL features —
    never a misparse — as do corrupt streams.

    Features per image: dimensions, palette size, pixel count, the
    exact integer SUM of palette indices (a one-bit LZW error moves
    it), per-channel byte sums after palette mapping, and the
    top-left mapped pixel. Same Arrow-batched ``mapInPandas`` shape
    as :func:`png_decode_features`; payload bytes never leave the
    executor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    gif_feature_row(int(doc_id), bytes(payload))
                    for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
                ]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=GIF_SCHEMA
    )


GIF_SCHEMA = (
    "doc_id long, width int, height int, n_colors int, "
    "n_pixels long, idx_sum long, sum_r long, sum_g long, "
    "sum_b long, px00_r int, px00_g int, px00_b int"
)


def gif_feature_row(doc_id: int, payload: bytes) -> dict:
    """One GIF's feature row (the :func:`gif_decode_features` kernel
    body) — exposed per-row so fixture queries can fuse payload build
    and decode into a single Python boundary crossing."""
    import struct

    import numpy as np

    row = {
        "doc_id": int(doc_id), "width": None, "height": None,
        "n_colors": None, "n_pixels": None, "idx_sum": None,
        "sum_r": None, "sum_g": None, "sum_b": None,
        "px00_r": None, "px00_g": None, "px00_b": None,
    }
    try:
        b = bytes(payload)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack_from("<HH", b, 6)
            packed = b[10]
            pos = 13
            pal = None
            if packed & 0x80:
                n = 2 << (packed & 0x07)
                pal = np.frombuffer(
                    b, np.uint8, n * 3, pos
                ).reshape(n, 3)
                pos += n * 3
            while pos < len(b) and b[pos] == 0x21:
                pos += 2  # introducer + label
                while b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
            if (
                pal is not None
                and pos < len(b)
                and b[pos] == 0x2C
                and w * h <= 25_000_000
            ):
                iw, ih = struct.unpack_from("<HH", b, pos + 5)
                ipacked = b[pos + 9]
                pos += 10
                if not (ipacked & 0xC0):  # no local pal,
                    mcs = b[pos]  # not interlaced
                    pos += 1
                    data = bytearray()
                    while b[pos] != 0:
                        ln = b[pos]
                        data += b[pos + 1 : pos + 1 + ln]
                        pos += 1 + ln
                    idx = np.array(
                        gif_lzw_decode(
                            bytes(data), mcs,
                            max_out=int(iw) * int(ih),
                        ),
                        dtype=np.int64,
                    )
                    if len(idx) == iw * ih and int(
                        idx.max(initial=0)
                    ) < len(pal):
                        rgb = pal[idx]
                        row.update(
                            width=int(iw), height=int(ih),
                            n_colors=len(pal),
                            n_pixels=int(iw) * int(ih),
                            idx_sum=int(idx.sum()),
                            sum_r=int(rgb[:, 0].sum()),
                            sum_g=int(rgb[:, 1].sum()),
                            sum_b=int(rgb[:, 2].sum()),
                            px00_r=int(rgb[0, 0]),
                            px00_g=int(rgb[0, 1]),
                            px00_b=int(rgb[0, 2]),
                        )
    except Exception:
        pass
    return row


# ------------------------------------------------------------------- TAR
# Minimal REAL ustar writer/walker — the WebDataset container format
# (training shards = tar archives of sample files). Pure offset/octal
# arithmetic per POSIX.1-1988; no library needed.


def tar_encode(members: list) -> bytes:
    """Minimal REAL ustar archive for fixtures and demos: ``members``
    is a list of ``(name, payload_bytes)``. Writes POSIX ustar headers
    (octal size, real checksum over the header with the checksum field
    blanked), 512-byte block padding, and the two-zero-block
    end-of-archive marker — any standards-compliant ``tar`` lists the
    output."""
    out = bytearray()
    for name, payload in members:
        nb = name.encode()
        if len(nb) > 100:
            raise ValueError("member name > 100 bytes")
        hdr = bytearray(512)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(payload):011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8  # checksum field blank during sum
        hdr[156] = 0x30  # typeflag '0' regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        csum = sum(hdr)
        hdr[148:156] = f"{csum:06o}\x00 ".encode()
        out += hdr
        out += payload
        pad = (-len(payload)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    return bytes(out)


def tar_members_features(
    df: DataFrame,
    *,
    id_col: str = "shard_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL tar-shard walk (round 9) — the WebDataset tier of the
    container family: training corpora at 100 TB ship as tar shards
    of sample files, and the first thing every loader does is walk
    headers. Parses ustar blocks (octal size field, 512-block
    advance), VERIFIES each header checksum (sum of header bytes with
    the checksum field read as spaces), and md5-fingerprints member
    payloads. Corrupt headers, bad checksums, or truncated archives
    yield NULL rows — never a misparse.

    One output row per member: ``(shard_id, member_name, size,
    content_md5, checksum_ok)``. Same Arrow-batched ``mapInPandas``
    shape as the image decoders; shard bytes never leave the
    executor, and shards parallelize embarrassingly — exactly how a
    WebDataset loader fleet scales."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                sid = int(sid)
                try:
                    b = bytes(payload)
                    pos = 0
                    while pos + 512 <= len(b):
                        hdr = b[pos : pos + 512]
                        if hdr == b"\x00" * 512:
                            break
                        name = hdr[0:100].split(b"\x00", 1)[0].decode()
                        # ustar prefix field (bytes 345..500): system
                        # tar stores path components beyond 100 chars
                        # here — prepend it so long member paths are
                        # never silently truncated (r9 ADVICE)
                        if hdr[257:263] == b"ustar\x00":
                            prefix = (
                                hdr[345:500].split(b"\x00", 1)[0].decode()
                            )
                            if prefix:
                                name = prefix + "/" + name
                        size = int(hdr[124:136].split(b"\x00")[0] or b"0", 8)
                        stored = int(
                            hdr[148:156].split(b"\x00")[0].strip() or b"0", 8
                        )
                        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
                        data = b[pos + 512 : pos + 512 + size]
                        if len(data) < size:
                            raise ValueError("truncated member")
                        rows.append(
                            {
                                "shard_id": sid,
                                "member_name": name,
                                "size": size,
                                "content_md5": hashlib.md5(
                                    data
                                ).hexdigest(),
                                "checksum_ok": calc == stored,
                            }
                        )
                        pos += 512 + size + ((-size) % 512)
                except Exception:
                    rows.append(
                        {
                            "shard_id": sid, "member_name": None,
                            "size": None, "content_md5": None,
                            "checksum_ok": None,
                        }
                    )
            yield pd.DataFrame(rows)

    schema = (
        "shard_id long, member_name string, size long, "
        "content_md5 string, checksum_ok boolean"
    )
    return df.select(id_col, payload_col).mapInPandas(kernel, schema=schema)


# ------------------------------------------------------------------- ZIP
# Minimal REAL ZIP writer/walker (PKWARE APPNOTE): local file headers,
# raw-deflate (wbits=-15) or stored members, CRC-32 verify, central
# directory + EOCD. The compressed-container sibling of the tar tier.


def zip_encode(members: list, *, compress=None) -> bytes:
    """Minimal REAL ZIP archive for fixtures and demos: ``members`` is
    ``(name, payload_bytes)``; ``compress`` (default: deflate) may be
    a callable ``name, payload -> bool`` choosing deflate vs stored
    per member. Real CRC-32s, raw-deflate streams, a correct central
    directory — stdlib ``zipfile`` opens the output (pinned in
    tests)."""
    import struct
    import zlib

    out = bytearray()
    central = bytearray()
    offsets = []
    for name, payload in members:
        nb = name.encode()
        want = True if compress is None else bool(compress(name, payload))
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        if want:
            co = zlib.compressobj(level=6, wbits=-15)
            data = co.compress(payload) + co.flush()
            method = 8
        else:
            data = payload
            method = 0
        offsets.append(len(out))
        out += struct.pack(
            "<IHHHHHIIIHH",
            0x04034B50, 20, 0, method, 0, 0x21,
            crc, len(data), len(payload), len(nb), 0,
        )
        out += nb + data
    cd_start = len(out)
    for (name, payload), off in zip(members, offsets):
        nb = name.encode()
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        # re-derive method/data length from the local header we wrote
        method = struct.unpack_from("<H", out, off + 8)[0]
        dlen = struct.unpack_from("<I", out, off + 18)[0]
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            0x02014B50, 20, 20, 0, method, 0, 0x21,
            crc, dlen, len(payload), len(nb), 0, 0, 0, 0, 0, off,
        )
        central += nb
    out += central
    out += struct.pack(
        "<IHHHHIIH",
        0x06054B50, 0, 0, len(members), len(members),
        len(central), cd_start, 0,
    )
    return bytes(out)


def zip_members_features(
    df: DataFrame,
    *,
    id_col: str = "shard_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL ZIP walk (round 9) — the COMPRESSED-container sibling of
    :func:`tar_members_features`: locate the end-of-central-directory
    record from the tail, walk the central directory (the authoritative
    member index — the reason ZIP supports listing without scanning
    bytes), read each local header, inflate raw-deflate members with
    stdlib zlib (stored members pass through), and VERIFY the CRC-32
    and declared sizes against the decompressed bytes. Malformed
    archives yield NULL rows — never a misparse.

    One row per member: ``(shard_id, member_name, method, size,
    comp_size, content_md5, crc_ok)``. Same Arrow-batched
    ``mapInPandas`` shape as the tar walker; shard bytes never leave
    the executor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct
        import zlib

        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                sid = int(sid)
                try:
                    b = bytes(payload)
                    eocd = b.rfind(b"\x50\x4b\x05\x06")
                    if eocd < 0:
                        raise ValueError("no EOCD")
                    n_entries = struct.unpack_from("<H", b, eocd + 10)[0]
                    cd_off = struct.unpack_from("<I", b, eocd + 16)[0]
                    pos = cd_off
                    for _ in range(n_entries):
                        if struct.unpack_from("<I", b, pos)[0] != 0x02014B50:
                            raise ValueError("bad CD entry")
                        method = struct.unpack_from("<H", b, pos + 10)[0]
                        crc, csize, usize = struct.unpack_from(
                            "<III", b, pos + 16
                        )
                        nlen, elen, clen = struct.unpack_from(
                            "<HHH", b, pos + 28
                        )
                        lho = struct.unpack_from("<I", b, pos + 42)[0]
                        name = b[pos + 46 : pos + 46 + nlen].decode()
                        # local header: skip its (possibly different)
                        # name/extra lengths to find the data
                        lnlen, lelen = struct.unpack_from(
                            "<HH", b, lho + 26
                        )
                        dstart = lho + 30 + lnlen + lelen
                        data = b[dstart : dstart + csize]
                        if len(data) < csize:
                            raise ValueError("truncated member")
                        if method == 8:
                            # cap at the declared size: a zip-bomb
                            # member cannot balloon past its header
                            # claim; one extra byte makes oversize
                            # fail the size check below
                            raw = zlib.decompressobj(-15).decompress(
                                data, usize + 1
                            )
                        elif method == 0:
                            raw = data
                        else:
                            raise ValueError(f"method {method}")
                        ok = (
                            len(raw) == usize
                            and (zlib.crc32(raw) & 0xFFFFFFFF) == crc
                        )
                        rows.append(
                            {
                                "shard_id": sid, "member_name": name,
                                "method": method, "size": len(raw),
                                "comp_size": csize,
                                "content_md5": hashlib.md5(
                                    raw
                                ).hexdigest(),
                                "crc_ok": ok,
                            }
                        )
                        pos += 46 + nlen + elen + clen
                except Exception:
                    rows.append(
                        {
                            "shard_id": sid, "member_name": None,
                            "method": None, "size": None,
                            "comp_size": None, "content_md5": None,
                            "crc_ok": None,
                        }
                    )
            yield pd.DataFrame(rows)

    schema = (
        "shard_id long, member_name string, method int, size long, "
        "comp_size long, content_md5 string, crc_ok boolean"
    )
    return df.select(id_col, payload_col).mapInPandas(kernel, schema=schema)


# ------------------------------------------------------------------ JPEG
# REAL baseline JPEG (ITU T.81 SOF0) codec in stdlib+NumPy — the
# fourth real decode tier after BMP / PNG / GIF, and the most common
# image format on any real training corpus. The encoder exists for
# fixtures and demos (like gif_encode / png_encode); the decoder is
# table-driven (Huffman + quant tables are READ from the file's
# DHT/DQT segments, never shared constants with the encoder) and is
# additionally pinned in tests against a bitstream hand-assembled
# from the spec's Annex K tables, independent of jpeg_encode.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU T.81 Annex K.3 typical Huffman tables (public spec constants).
# BITS = number of codes per length 1..16; HUFFVAL = symbols in code
# order. Used by the ENCODER only — the decoder rebuilds its tables
# from the DHT segments of whatever file it is given.
_K3_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _huff_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman assignment per T.81 C.2: symbol -> (code, len)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    c[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return c  # C @ s @ C.T = DCT coefficients; C.T @ S @ C = inverse


def _round_half_up(a):
    import numpy as np

    return np.sign(a) * np.floor(np.abs(a) + 0.5)


class _JpegBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F >> (7 - ((8 - self.n) % 8)), (8 - self.n) % 8)
        return bytes(self.buf)


def _mag_bits(v: int) -> tuple:
    """Magnitude category + extension bits for a DC diff / AC coeff
    (T.81 F.1.2.1): negative values encode as v + 2^s - 1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _jpeg_prepare_planes(a, h: int, w: int, ncomp: int, sub420: bool):
    """Color-convert, optionally 4:2:0-subsample (2x2 mean with
    round-half-up), and MCU-pad (edge replication) the input into
    per-component float planes — shared by the baseline and
    progressive encoders so both persist identical samples."""
    import numpy as np

    if ncomp == 3:
        r, g, b = a[:, :, 0].astype(float), a[:, :, 1].astype(float), a[
            :, :, 2
        ].astype(float)
        y = _round_half_up(0.299 * r + 0.587 * g + 0.114 * b)
        cb = _round_half_up(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = _round_half_up(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        planes = [np.clip(p, 0, 255) for p in (y, cb, cr)]
    else:
        planes = [a[:, :, 0].astype(float)]

    if sub420:
        # chroma: 2x2 mean with round-half-up (pad odd edges by
        # replication first so every cell has four samples)
        def down(p):
            ph2, pw2 = -(-h // 2) * 2, -(-w // 2) * 2
            p = np.pad(p, ((0, ph2 - h), (0, pw2 - w)), mode="edge")
            q = (
                p[0::2, 0::2] + p[0::2, 1::2]
                + p[1::2, 0::2] + p[1::2, 1::2]
            ) / 4.0
            return _round_half_up(q)

        planes = [planes[0], down(planes[1]), down(planes[2])]
        # pad luma to 16-multiples (MCU edge), chroma to 8-multiples
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        planes = [
            np.pad(
                planes[0], ((0, ph - h), (0, pw - w)), mode="edge"
            ),
            *[
                np.pad(
                    p,
                    ((0, ph // 2 - p.shape[0]), (0, pw // 2 - p.shape[1])),
                    mode="edge",
                )
                for p in planes[1:]
            ],
        ]
    else:
        # pad to 8-multiples by edge replication
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        planes = [
            np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            for p in planes
        ]
    return planes


def jpeg_encode(
    px, *, qtable=None, restart_interval: int = 0, subsampling: str = "444"
) -> bytes:
    """Minimal REAL baseline JPEG (SOF0) encoder for fixtures and
    demos: grayscale (h, w) or RGB (h, w, 3) uint8 input, 4:4:4 or
    4:2:0 (``subsampling="420"``, RGB only: luma 2x2, chroma averaged
    over 2x2 with round-half-up — the dominant real-world shape),
    Annex K.3 luminance Huffman tables for every component, one quant
    table (default: all ones — DC-only inputs then round-trip
    exactly), MCU-edge replicate padding, real byte stuffing,
    optional DRI/RSTn restart markers. Output decodes in any baseline
    JPEG decoder."""
    import struct

    import numpy as np

    a = np.asarray(px, dtype=np.int64)
    gray = a.ndim == 2
    if gray:
        a = a[:, :, None]
    h, w, ncomp = a.shape
    if ncomp not in (1, 3):
        raise ValueError("expected grayscale or RGB input")
    q = np.ones((8, 8), dtype=np.int64) if qtable is None else np.asarray(
        qtable, dtype=np.int64
    ).reshape(8, 8)

    sub420 = subsampling == "420"
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if sub420 and ncomp != 3:
        raise ValueError("4:2:0 requires an RGB input")
    planes = _jpeg_prepare_planes(a, h, w, ncomp, sub420)
    ph, pw = planes[0].shape

    dc_map = _huff_codes(*_K3_DC_LUMA)
    ac_map = _huff_codes(*_K3_AC_LUMA)
    C = _dct_matrix()

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (Pq=0 8-bit, Tq=0)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(int(q.reshape(-1)[_ZIGZAG[i]]) for i in range(64))
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = 0x22 if (sub420 and ci == 0) else 0x11
        out += bytes([ci + 1, hv, 0])  # id, sampling, qtable 0
    # DHT: DC table 0 + AC table 0
    for cls, (bits, vals) in ((0, _K3_DC_LUMA), (1, _K3_AC_LUMA)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([cls << 4]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"  # spectral 0..63, no approximation

    wtr = _JpegBitWriter()
    pred = [0] * ncomp
    mcu_i = 0
    mcu_px = 16 if sub420 else 8
    blocks_of = (
        ([(0, 0, 0), (0, 8, 0), (8, 0, 0), (8, 8, 0)]
         + [(0, 0, 1), (0, 0, 2)])
        if sub420
        else [(0, 0, ci) for ci in range(ncomp)]
    )
    for by in range(ph // mcu_px):
        for bx in range(pw // mcu_px):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                out += wtr.flush()
                out += bytes(
                    [0xFF, 0xD0 + ((mcu_i // restart_interval) - 1) % 8]
                )
                wtr = _JpegBitWriter()
                pred = [0] * ncomp
            mcu_i += 1
            for oy, ox, ci in blocks_of:
                plane = planes[ci]
                scale_f = 2 if (sub420 and ci > 0) else 1
                y0 = (by * mcu_px + oy) // scale_f
                x0 = (bx * mcu_px + ox) // scale_f
                blk = plane[y0 : y0 + 8, x0 : x0 + 8]
                coef = C @ (blk - 128.0) @ C.T
                qc = _round_half_up(coef / q).astype(np.int64)
                zz = qc.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s, bitsv = _mag_bits(diff)
                code, ln = dc_map[s]
                wtr.put(code, ln)
                if s:
                    wtr.put(bitsv, s)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_map[0xF0]  # ZRL
                        wtr.put(code, ln)
                        run -= 16
                    s, bitsv = _mag_bits(v)
                    code, ln = ac_map[(run << 4) | s]
                    wtr.put(code, ln)
                    wtr.put(bitsv, s)
                    run = 0
                if run:
                    code, ln = ac_map[0x00]  # EOB
                    wtr.put(code, ln)
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# AC Huffman table for the progressive encoder: every (run, size)
# symbol with size <= 10 at a flat 9-bit code length (176 symbols fit
# comfortably in the 511 available 9-bit codes). Unlike the K.3
# baseline table this includes the EOBn symbols (r<<4, r = 0..14) that
# progressive spectral-selection scans need for end-of-band runs. The
# decoder reads whatever DHT the file carries, so a non-optimal table
# costs bytes, never correctness.
_FLAT9_AC = (
    [0] * 8 + [176] + [0] * 7,
    [(r << 4) | s for r in range(16) for s in range(11)],
)


def _jpeg_quantized_blocks(planes, q):
    """Per-component grids of quantized zigzag coefficients,
    (block_rows, block_cols, 64) int64 — computed per block with the
    EXACT float-op sequence the baseline encoder uses
    (``C @ (blk - 128.0) @ C.T`` then round-half-up of ``coef / q``)
    so baseline and progressive streams persist identical
    coefficients bit for bit."""
    import numpy as np

    C = _dct_matrix()
    out = []
    for p in planes:
        ph, pw = p.shape
        bh, bw = ph // 8, pw // 8
        zz = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = C @ (blk - 128.0) @ C.T
                qc = _round_half_up(coef / q).astype(np.int64)
                zz[by, bx] = qc.reshape(-1)[_ZIGZAG]
        out.append(zz)
    return out


def jpeg_encode_progressive(
    px, *, qtable=None, restart_interval: int = 0, subsampling: str = "444"
) -> bytes:
    """Minimal REAL progressive JPEG (SOF2) encoder for fixtures,
    demos, and round-trip tests: spectral selection (one interleaved
    DC scan, then AC bands 1-5 and 6-63 per component) combined with
    successive approximation (AC coded at Al=2 then refined 2->1->0;
    DC at Al=1 refined to 0) — the scan-script shape cjpeg emits by
    default, so the decoder sees the same stream structure a real
    scraped web corpus carries. Grayscale or RGB, 4:4:4 or 4:2:0,
    optional DRI/RSTn restart markers in every scan.

    The quantized coefficients are computed with the exact float-op
    sequence of :func:`jpeg_encode`, so progressive decode MUST equal
    baseline decode of the same input bit for bit — the property the
    tests pin. AC scans use a flat 9-bit Huffman table carrying the
    EOBn end-of-band symbols; the DC scan reuses the Annex K.3 table.
    """
    import struct

    import numpy as np

    a = np.asarray(px, dtype=np.int64)
    gray = a.ndim == 2
    if gray:
        a = a[:, :, None]
    h, w, ncomp = a.shape
    if ncomp not in (1, 3):
        raise ValueError("expected grayscale or RGB input")
    q = np.ones((8, 8), dtype=np.int64) if qtable is None else np.asarray(
        qtable, dtype=np.int64
    ).reshape(8, 8)
    sub420 = subsampling == "420"
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if sub420 and ncomp != 3:
        raise ValueError("4:2:0 requires an RGB input")

    planes = _jpeg_prepare_planes(a, h, w, ncomp, sub420)
    zz = _jpeg_quantized_blocks(planes, q)
    ph, pw = planes[0].shape
    mcu_px = 16 if sub420 else 8
    mw, mh = pw // mcu_px, ph // mcu_px
    hmax = 2 if sub420 else 1
    ri = restart_interval

    dc_map = _huff_codes(*_K3_DC_LUMA)
    ac_map = _huff_codes(*_FLAT9_AC)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"  # DQT
    out += bytes(int(q.reshape(-1)[_ZIGZAG[i]]) for i in range(64))
    # SOF2 (progressive DCT, Huffman)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = 0x22 if (sub420 and ci == 0) else 0x11
        out += bytes([ci + 1, hv, 0])
    # DHT: DC table 0 (K.3) + AC table 0 (flat-9 incl. EOBn)
    for cls, (bits, vals) in ((0, _K3_DC_LUMA), (1, _FLAT9_AC)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([cls << 4]) + bytes(bits) + bytes(vals)
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)

    def sos_header(comp_idx, ss, se, ah, al_):
        hdr = bytearray(
            b"\xff\xda"
            + struct.pack(">HB", 6 + 2 * len(comp_idx), len(comp_idx))
        )
        for ci in comp_idx:
            hdr += bytes([ci + 1, 0x00])
        hdr += bytes([ss, se, (ah << 4) | al_])
        return bytes(hdr)

    def mcu_blocks(my, mx):
        """(ci, by, bx) of every data block in MCU (my, mx), in the
        interleave order the decoder walks."""
        for ci in range(ncomp):
            f = 2 if (sub420 and ci == 0) else 1
            for byi in range(f):
                for bxi in range(f):
                    yield ci, my * f + byi, mx * f + bxi

    def dc_scan(al_, refine):
        body = bytearray()
        wtr = _JpegBitWriter()
        pred = [0] * ncomp
        rstn = 0
        m = 0
        for my in range(mh):
            for mx in range(mw):
                if ri and m and m % ri == 0:
                    body += wtr.flush()
                    body += bytes([0xFF, 0xD0 + rstn % 8])
                    rstn += 1
                    wtr = _JpegBitWriter()
                    pred = [0] * ncomp
                m += 1
                for ci, by, bx in mcu_blocks(my, mx):
                    full = int(zz[ci][by, bx, 0])
                    if refine:
                        wtr.put(full & 1, 1)
                        continue
                    v = full >> al_  # arithmetic shift, per G.1.2.1
                    diff = v - pred[ci]
                    pred[ci] = v
                    s, bitsv = _mag_bits(diff)
                    code, ln = dc_map[s]
                    wtr.put(code, ln)
                    if s:
                        wtr.put(bitsv, s)
        body += wtr.flush()
        return body

    def ac_scan(ci, ss_, se_, ah_, al_):
        grid = zz[ci]
        f = 2 if (sub420 and ci == 0) else 1
        # natural (not MCU-padded) block grid of this component
        # (vmax == hmax for both supported sampling shapes)
        cw_px = -(-(w * f) // hmax)
        ch_px = -(-(h * f) // hmax)
        cw_b, ch_b = -(-cw_px // 8), -(-ch_px // 8)
        body = bytearray()
        wtr = _JpegBitWriter()
        st = {"eobrun": 0, "bits": []}
        rstn = 0

        def emit_eobrun():
            n = st["eobrun"]
            if n:
                r = n.bit_length() - 1
                code, ln = ac_map[r << 4]
                wtr.put(code, ln)
                if r:
                    wtr.put(n - (1 << r), r)
                st["eobrun"] = 0
            for bb in st["bits"]:
                wtr.put(bb, 1)
            st["bits"] = []

        for m in range(ch_b * cw_b):
            if ri and m and m % ri == 0:
                emit_eobrun()
                body += wtr.flush()
                body += bytes([0xFF, 0xD0 + rstn % 8])
                rstn += 1
                wtr = _JpegBitWriter()
            by, bx = divmod(m, cw_b)
            row = grid[by, bx]
            if ah_ == 0:
                # first scan for this band: signed values at Al
                vals = []
                for k in range(ss_, se_ + 1):
                    c = int(row[k])
                    mag = (c if c >= 0 else -c) >> al_
                    vals.append(mag if c >= 0 else -mag)
                keob = -1
                for i, v in enumerate(vals):
                    if v:
                        keob = i
                if keob < 0:
                    st["eobrun"] += 1
                    if st["eobrun"] == 0x7FFF:
                        emit_eobrun()
                    continue
                emit_eobrun()
                r = 0
                for i in range(keob + 1):
                    v = vals[i]
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, ln = ac_map[0xF0]  # ZRL
                        wtr.put(code, ln)
                        r -= 16
                    s, bitsv = _mag_bits(v)
                    code, ln = ac_map[(r << 4) | s]
                    wtr.put(code, ln)
                    wtr.put(bitsv, s)
                    r = 0
                if keob < len(vals) - 1:
                    st["eobrun"] += 1
                    if st["eobrun"] == 0x7FFF:
                        emit_eobrun()
            else:
                # refinement: newly-nonzero symbols + correction bits
                # (mirrors T.81 G.1.2.3 / encode_mcu_AC_refine)
                absv = [
                    (abs(int(row[k])) >> al_) for k in range(ss_, se_ + 1)
                ]
                keob = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        keob = i
                br = []
                if keob < 0:
                    for t in absv:
                        if t > 1:
                            br.append(t & 1)
                    st["eobrun"] += 1
                    st["bits"].extend(br)
                    if st["eobrun"] == 0x7FFF:
                        emit_eobrun()
                    continue
                r = 0
                for i in range(keob + 1):
                    t = absv[i]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        emit_eobrun()
                        code, ln = ac_map[0xF0]
                        wtr.put(code, ln)
                        r -= 16
                        for bb in br:
                            wtr.put(bb, 1)
                        br = []
                    if t > 1:  # history-nonzero: correction bit
                        br.append(t & 1)
                        continue
                    # t == 1: newly nonzero this pass
                    emit_eobrun()
                    code, ln = ac_map[(r << 4) | 1]
                    wtr.put(code, ln)
                    wtr.put(1 if int(row[ss_ + i]) >= 0 else 0, 1)
                    for bb in br:
                        wtr.put(bb, 1)
                    br = []
                    r = 0
                for i in range(keob + 1, len(absv)):
                    if absv[i] > 1:
                        br.append(absv[i] & 1)
                if r > 0 or br or keob < len(absv) - 1:
                    st["eobrun"] += 1
                    st["bits"].extend(br)
                    if st["eobrun"] == 0x7FFF:
                        emit_eobrun()
        emit_eobrun()
        body += wtr.flush()
        return body

    # scan script: DC(Al=1) -> AC bands at Al=2 -> AC refine 2->1 ->
    # AC refine 1->0 -> DC refine 1->0 (per-component AC scans)
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1) + dc_scan(1, False)
    for (ss_, se_) in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            out += sos_header([ci], ss_, se_, 0, 2) + ac_scan(
                ci, ss_, se_, 0, 2
            )
    for (ah_, al_) in ((2, 1), (1, 0)):
        for (ss_, se_) in ((1, 5), (6, 63)):
            for ci in range(ncomp):
                out += sos_header([ci], ss_, se_, ah_, al_) + ac_scan(
                    ci, ss_, se_, ah_, al_
                )
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0) + dc_scan(0, True)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over an unstuffed entropy-coded segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit cursor

    def bit(self) -> int:
        i = self.pos
        if (i >> 3) >= len(self.data):
            raise ValueError("truncated entropy segment")
        self.pos += 1
        return (self.data[i >> 3] >> (7 - (i & 7))) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s raw bits to a signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(
    payload: bytes, *, dc_only: bool = False, max_pixels: int = 25_000_000
):
    """Public entry for the baseline JPEG decoder — delegates to
    :func:`_jpeg_decode_walk` and guarantees the documented error
    contract: EVERY corrupt/truncated stream raises ``ValueError``.
    Segment payloads cut mid-DQT/DHT/SOF used to escape as raw
    ``IndexError``/``struct.error`` from slicing and ``unpack_from``
    (r10 ADVICE); the marker walk is now wrapped so callers like
    :func:`decode_image` and :func:`extract_features` never see
    anything but ``ValueError`` for bad bytes."""
    import struct

    try:
        return _jpeg_decode_walk(
            payload, dc_only=dc_only, max_pixels=max_pixels
        )
    except ValueError:
        raise
    except (IndexError, struct.error, KeyError, StopIteration) as exc:
        raise ValueError(
            f"truncated or corrupt JPEG segment: {exc!r}"
        ) from exc


def _jpeg_decode_walk(
    payload: bytes, *, dc_only: bool = False, max_pixels: int = 25_000_000
):
    """REAL baseline JPEG decoder (ITU T.81 sequential DCT, SOF0/SOF1):
    marker walk, DQT (8/16-bit) and DHT parsed FROM THE FILE, Huffman
    entropy decode (DC prediction + EXTEND, AC run-length with
    ZRL/EOB), byte unstuffing, DRI/RSTn restart handling, dequantize,
    un-zigzag, exact float IDCT (vectorized across all blocks), level
    shift, and JFIF YCbCr->RGB for 3-component scans. Supported
    surface: 8-bit precision, 1 or 3 components, 4:4:4 AND 4:2:0
    (luma 2x2 / chroma 1x1 interleaved MCUs with replicate chroma
    upsampling) — together the shapes that cover virtually every
    ML-corpus JPEG; progressive (SOF2) or other sampling layouts
    raise ``ValueError`` (callers surface NULL rows — never a
    misparse).

    ``max_pixels`` bounds the declared SOF dimensions so a crafted
    header cannot demand a multi-GB allocation (raise, never OOM).

    Returns ``(rgb, n_components)`` where rgb is (h, w, 3) uint8.
    With ``dc_only=True`` it returns the 1/8-scale DC thumbnail
    instead — (ceil(h/8), ceil(w/8), 3) — the classic library-free
    JPEG resize (the DC coefficient is 8x the block mean), skipping
    IDCT and full-plane assembly.
    """
    import struct

    import numpy as np

    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict = {}
    htables: dict = {}  # (class, id) -> {(len, code): symbol}
    frame = None
    restart_interval = 0
    coeffs = None  # progressive: persistent per-component grids
    n_scans = 0
    saw_eoi = False
    inv_zz = [0] * 64
    for i, z in enumerate(_ZIGZAG):
        inv_zz[z] = i

    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            saw_eoi = True
            break
        if pos + 2 > len(b):
            raise ValueError("truncated marker segment")
        (seglen,) = struct.unpack_from(">H", b, pos)
        if seglen < 2:
            # a length below 2 can't even cover the length field; on
            # corrupt input `pos += seglen` would stop advancing and
            # the marker walk would spin forever — fail instead
            raise ValueError("corrupt marker segment length")
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if pq:
                    raw = struct.unpack_from(">64H", seg, sp)
                    sp += 128
                else:
                    raw = seg[sp : sp + 64]
                    sp += 64
                t = np.zeros(64, dtype=np.int64)
                for i in range(64):
                    t[_ZIGZAG[i]] = raw[i]
                qtables[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                table, code, k = {}, 0, 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                htables[(tc, th)] = table
                sp += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 seq., SOF2 prog.
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                comps.append(
                    {
                        "id": cid, "tq": tq,
                        "hi": hv >> 4, "vi": hv & 0x0F,
                        "fci": ci,  # frame-order index (scan lookup)
                    }
                )
            if nc not in (1, 3):
                raise ValueError("only 1 or 3 components supported")
            factors = [(c["hi"], c["vi"]) for c in comps]
            if not (
                all(f == (1, 1) for f in factors)
                or (nc == 3 and factors == [(2, 2), (1, 1), (1, 1)])
            ):
                # supported sampling: 4:4:4 (all 1x1) and 4:2:0
                # (luma 2x2, chroma 1x1) — the two shapes that cover
                # virtually every ML-corpus JPEG
                raise ValueError("unsupported sampling factors")
            if fh * fw > max_pixels or fh == 0 or fw == 0:
                # a crafted/corrupt SOF can declare 65535x65535 and
                # demand a multi-GB coefficient allocation before any
                # pixel data exists — bound it (raise, never OOM)
                raise ValueError("image dimensions exceed max_pixels")
            hmax = max(c["hi"] for c in comps)
            vmax = max(c["vi"] for c in comps)
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "hmax": hmax, "vmax": vmax,
                "mw": -(-fw // (8 * hmax)), "mh": -(-fh // (8 * vmax)),
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG (lossless/hier/arith)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(
                    c for c in frame["comps"] if c["id"] == cs
                )
                scan.append(
                    {"comp": comp, "dc": tt >> 4, "ac": tt & 0x0F}
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            aa = seg[3 + 2 * ns]
            ah, al = aa >> 4, aa & 0x0F
            # unstuff the entropy-coded data, splitting at RSTn
            ep = pos + seglen
            segments, cur = [], bytearray()
            while ep + 1 < len(b):
                byte = b[ep]
                if byte != 0xFF:
                    cur.append(byte)
                    ep += 1
                    continue
                nxt = b[ep + 1]
                if nxt == 0x00:
                    cur.append(0xFF)
                    ep += 2
                elif 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    ep += 2
                else:
                    break  # a real marker ends the scan
            segments.append(bytes(cur))
            if not frame["progressive"]:
                return _jpeg_decode_scan(
                    frame, scan, segments, qtables, htables,
                    restart_interval, inv_zz, dc_only=dc_only,
                )
            # progressive: accumulate this scan's coefficient bits
            # into the persistent per-component grids and keep
            # walking markers until EOI
            n_scans += 1
            if n_scans > 100:
                # a crafted stream could declare thousands of cheap
                # refinement scans; bound the work (real files < ~20)
                raise ValueError("too many progressive scans")
            if coeffs is None:
                coeffs = [
                    np.zeros(
                        (frame["mh"] * c["vi"], frame["mw"] * c["hi"], 64),
                        dtype=np.int64,
                    )
                    for c in frame["comps"]
                ]
            _jpeg_progressive_scan(
                frame, scan, ss, se, ah, al, segments,
                restart_interval, htables, coeffs,
            )
            pos = ep
            continue
        pos += seglen
    if saw_eoi and coeffs is not None:
        return _jpeg_finish(frame, qtables, coeffs, inv_zz, dc_only)
    if coeffs is not None:
        raise ValueError("truncated progressive stream (no EOI)")
    raise ValueError("no SOS marker found")


def _jpeg_decode_scan(
    frame, scan, segments, qtables, htables, ri, inv_zz,
    dc_only: bool = False,
):
    """Baseline (single-scan) entropy decode into per-component block
    grids, then the shared :func:`_jpeg_finish` dequant/IDCT tail."""
    import numpy as np

    mw, mh = frame["mw"], frame["mh"]
    n_mcu = mw * mh
    nc = len(scan)
    if sorted(sc["comp"]["fci"] for sc in scan) != list(range(nc)) or (
        nc != len(frame["comps"])
    ):
        raise ValueError("baseline scan must cover every component once")
    coeffs = [None] * nc
    for sc in scan:
        c = sc["comp"]
        coeffs[c["fci"]] = np.zeros(
            (mh * c["vi"], mw * c["hi"], 64), dtype=np.int64
        )
    pred = [0] * nc
    seg_i = 0
    rdr = _JpegBitReader(segments[0])
    for m in range(n_mcu):
        if ri and m and m % ri == 0:
            seg_i += 1  # RSTn: byte-align + reset DC prediction
            if seg_i >= len(segments):
                raise ValueError("missing restart segment")
            rdr = _JpegBitReader(segments[seg_i])
            pred = [0] * nc
        myy, mxx = divmod(m, mw)
        for ci, sc in enumerate(scan):
            hi, vi = sc["comp"]["hi"], sc["comp"]["vi"]
            dct = htables.get((0, sc["dc"]))
            act = htables.get((1, sc["ac"]))
            if dct is None or act is None:
                raise ValueError("missing Huffman table")
            grid = coeffs[sc["comp"]["fci"]]
            for bsub in range(hi * vi):
                byi, bxi = divmod(bsub, hi)
                s = rdr.huff(dct)
                diff = _extend(rdr.bits(s), s) if s else 0
                pred[ci] += diff
                row = grid[myy * vi + byi, mxx * hi + bxi]
                row[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = rdr.huff(act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC index overflow")
                    row[k] = _extend(rdr.bits(s), s)
                    k += 1
    return _jpeg_finish(frame, qtables, coeffs, inv_zz, dc_only)


def _jpeg_progressive_scan(
    frame, scan, ss, se, ah, al, segments, ri, htables, coeffs
):
    """Decode ONE progressive (SOF2) scan into the persistent
    per-component coefficient grids, per ITU T.81 G.2: DC first /
    refinement scans (interleaved MCU order, or a single component's
    natural block grid), AC first scans with EOBn run-length coding
    (spectral selection), and AC refinement scans with correction
    bits (successive approximation). Restart markers byte-align the
    reader and reset DC prediction + the EOB run."""

    if not (0 <= ss <= se <= 63) or ah > 13 or al > 13:
        raise ValueError("bad progressive scan parameters")
    if ss == 0 and se != 0:
        raise ValueError("DC scan must have Se = 0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("AC scans must be single-component")
    if ah and ah != al + 1:
        raise ValueError("successive approximation must refine one bit")
    p1 = 1 << al
    state = {
        "eobrun": 0,
        "seg": 0,
        "rdr": _JpegBitReader(segments[0]),
        "pred": [0] * len(scan),
    }

    def restart():
        state["seg"] += 1
        if state["seg"] >= len(segments):
            raise ValueError("missing restart segment")
        state["rdr"] = _JpegBitReader(segments[state["seg"]])
        state["pred"] = [0] * len(scan)
        state["eobrun"] = 0

    def dc_unit(ci, row):
        rdr = state["rdr"]
        if ah == 0:  # first DC scan: coded like baseline, scaled <<Al
            dct = htables.get((0, scan[ci]["dc"]))
            if dct is None:
                raise ValueError("missing Huffman table")
            s = rdr.huff(dct)
            diff = _extend(rdr.bits(s), s) if s else 0
            state["pred"][ci] += diff
            row[0] = state["pred"][ci] << al
        else:  # refinement: one raw bit per block (two's-complement OR)
            if rdr.bit():
                row[0] = int(row[0]) | p1

    def ac_first(row):
        rdr = state["rdr"]
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        act = htables.get((1, scan[0]["ac"]))
        if act is None:
            raise ValueError("missing Huffman table")
        k = ss
        while k <= se:
            rs = rdr.huff(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                # EOBn: run of (1<<r)+bits block-ends incl. this one
                state["eobrun"] = (1 << r) - 1 + (
                    rdr.bits(r) if r else 0
                )
                break
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            row[k] = _extend(rdr.bits(s), s) << al
            k += 1

    def ac_refine(row):
        rdr = state["rdr"]
        k = ss
        if state["eobrun"] == 0:
            act = htables.get((1, scan[0]["ac"]))
            if act is None:
                raise ValueError("missing Huffman table")
            while k <= se:
                rs = rdr.huff(act)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) + (
                            rdr.bits(r) if r else 0
                        )
                        break  # correction sweep + decrement below
                    # ZRL: skip 16 zero-history positions
                elif s == 1:
                    newval = p1 if rdr.bit() else -p1
                else:
                    raise ValueError("bad refinement magnitude")
                # advance over r zero-history positions, reading a
                # correction bit for each nonzero-history coefficient
                # passed over (T.81 G.1.2.3 / decode_mcu_AC_refine)
                while k <= se:
                    v = int(row[k])
                    if v != 0:
                        if rdr.bit() and (v & p1) == 0:
                            row[k] = v + (p1 if v >= 0 else -p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    row[k] = newval
                k += 1
        if state["eobrun"] > 0:
            # EOB-run block (or the tail of the block that decoded
            # the EOBn): correction bits only, for nonzero history
            while k <= se:
                v = int(row[k])
                if v != 0:
                    if rdr.bit() and (v & p1) == 0:
                        row[k] = v + (p1 if v >= 0 else -p1)
                k += 1
            state["eobrun"] -= 1

    if ss == 0 and len(scan) > 1:
        # interleaved DC scan over the frame MCU grid
        mw, mh = frame["mw"], frame["mh"]
        for m in range(mw * mh):
            if ri and m and m % ri == 0:
                restart()
            myy, mxx = divmod(m, mw)
            for ci, sc in enumerate(scan):
                hi, vi = sc["comp"]["hi"], sc["comp"]["vi"]
                grid = coeffs[sc["comp"]["fci"]]
                for bsub in range(hi * vi):
                    byi, bxi = divmod(bsub, hi)
                    dc_unit(ci, grid[myy * vi + byi, mxx * hi + bxi])
    else:
        # single-component scan: the component's NATURAL block grid
        # (not padded to MCU multiples), row-major — T.81 A.2.2
        c = scan[0]["comp"]
        grid = coeffs[c["fci"]]
        cw_px = -(-(frame["w"] * c["hi"]) // frame["hmax"])
        ch_px = -(-(frame["h"] * c["vi"]) // frame["vmax"])
        cw_b, ch_b = -(-cw_px // 8), -(-ch_px // 8)
        for m in range(ch_b * cw_b):
            if ri and m and m % ri == 0:
                restart()
            by, bx = divmod(m, cw_b)
            row = grid[by, bx]
            if ss == 0:
                dc_unit(0, row)
            elif ah == 0:
                ac_first(row)
            else:
                ac_refine(row)


def _jpeg_finish(frame, qtables, coeffs, inv_zz, dc_only):
    """Shared tail of baseline and progressive decode: dequantize,
    un-zigzag, vectorized exact-float IDCT (or the DC-only 1/8-scale
    preview), assemble/crop/replicate-upsample per-component planes,
    then JFIF YCbCr->RGB. ``coeffs`` is one (block_rows, block_cols,
    64) int64 zigzag-order grid per frame component."""
    import numpy as np

    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    nc = len(comps)

    def upsample(c, plane, unit: int):
        """Crop to the component's natural size (in ``unit``-pixel
        cells) and replicate up to full resolution."""
        hi, vi = c["hi"], c["vi"]
        cw_px = -(-(w * hi) // hmax)  # natural comp width in pixels
        ch_px = -(-(h * vi) // vmax)
        cw = cw_px if unit == 1 else -(-cw_px // 8)
        ch = ch_px if unit == 1 else -(-ch_px // 8)
        plane = plane[:ch, :cw]
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        th = h if unit == 1 else -(-h // 8)
        tw = w if unit == 1 else -(-w // 8)
        return plane[:th, :tw]

    planes = []
    if dc_only:
        # 1/8-scale thumbnail straight from the DC coefficients — the
        # classic decode-free resize: the DC term IS 8x the block mean,
        # so thumb pixel = round(DC*Q00/8) + 128 per block. Entropy
        # decoding still walks every coefficient (the bitstream has no
        # skip index), but IDCT and full-plane assembly are skipped.
        for ci, c in enumerate(comps):
            q = qtables.get(c["tq"])
            if q is None:
                raise ValueError("missing quant table")
            dc = coeffs[ci][:, :, 0].astype(np.float64) * float(q[0, 0])
            px = np.clip(_round_half_up(dc / 8.0) + 128, 0, 255).astype(
                np.uint8
            )
            planes.append(upsample(c, px, 8))
        return _jpeg_planes_to_rgb(planes, nc)
    # dequantize + un-zigzag + one vectorized IDCT over all blocks,
    # then a pure reshape/transpose assembles the plane (no Python
    # loop over MCUs)
    C = _dct_matrix()
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("missing quant table")
        bh, bw = coeffs[ci].shape[:2]
        nb = bh * bw
        dq = coeffs[ci].reshape(nb, 64)[:, inv_zz].reshape(nb, 8, 8) * q[
            None
        ]
        spatial = np.einsum(
            "ux,muv,vy->mxy", C, dq.astype(np.float64), C
        )
        px = np.clip(_round_half_up(spatial) + 128, 0, 255).astype(
            np.uint8
        )
        plane = (
            px.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        planes.append(upsample(c, plane, 1))
    return _jpeg_planes_to_rgb(planes, nc)


def _jpeg_planes_to_rgb(planes, nc):
    import numpy as np

    if nc == 1:
        g = planes[0]
        return np.stack([g, g, g], axis=-1), 1
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = np.clip(_round_half_up(y + 1.402 * cr), 0, 255)
    g = np.clip(
        _round_half_up(y - 0.344136 * cb - 0.714136 * cr), 0, 255
    )
    b = np.clip(_round_half_up(y + 1.772 * cb), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8), 3


def jpeg_decode_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL JPEG decode (round 10) — the fourth real decode tier
    after BMP, PNG, and GIF, and the format that dominates any real
    image corpus: full SOF0 pipeline (marker walk, file-driven
    DQT/DHT, Huffman entropy decode with DC prediction and EXTEND,
    restart markers, dequant, un-zigzag, exact float IDCT, JFIF
    YCbCr->RGB) on actual entropy-coded bytes; 4:4:4 and 4:2:0
    chroma subsampling are both supported decode paths. Unsupported
    shapes (progressive or other sampling layouts) and corrupt
    streams yield NULL rows — never a misparse.

    Features per image: dimensions, component count, pixel count,
    per-channel byte sums and the top-left pixel — one wrong Huffman
    bit or IDCT slip moves the sums. Same Arrow-batched
    ``mapInPandas`` shape as the other decoders; payload bytes never
    leave the executor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    jpeg_feature_row(int(doc_id), bytes(payload))
                    for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
                ]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=JPEG_SCHEMA
    )


JPEG_SCHEMA = (
    "doc_id long, width int, height int, n_components int, "
    "n_pixels long, sum_r long, sum_g long, sum_b long, "
    "px00_r int, px00_g int, px00_b int"
)


def jpeg_feature_row(doc_id: int, payload: bytes) -> dict:
    """One JPEG's full-decode feature row (the
    :func:`jpeg_decode_features` kernel body) — exposed per-row so
    fixture queries can fuse payload build and decode into a single
    Python boundary crossing."""
    row = {
        "doc_id": int(doc_id), "width": None, "height": None,
        "n_components": None, "n_pixels": None,
        "sum_r": None, "sum_g": None, "sum_b": None,
        "px00_r": None, "px00_g": None, "px00_b": None,
    }
    try:
        rgb, nc = jpeg_decode(bytes(payload))
        hh, ww = rgb.shape[:2]
        row.update(
            width=int(ww), height=int(hh),
            n_components=int(nc),
            n_pixels=int(ww) * int(hh),
            sum_r=int(rgb[:, :, 0].sum(dtype="int64")),
            sum_g=int(rgb[:, :, 1].sum(dtype="int64")),
            sum_b=int(rgb[:, :, 2].sum(dtype="int64")),
            px00_r=int(rgb[0, 0, 0]),
            px00_g=int(rgb[0, 0, 1]),
            px00_b=int(rgb[0, 0, 2]),
        )
    except Exception:
        pass
    return row


def exif_app1_segment(
    *,
    orientation: int | None = None,
    datetime: str | None = None,
    make: str | None = None,
    byte_order: str = "II",
    gps_lat: tuple[str, int, int, int, int] | None = None,
    gps_lon: tuple[str, int, int, int, int] | None = None,
    thumbnail: bytes | None = None,
) -> bytes:
    """Build an APP1 Exif segment (marker + length + ``Exif\\0\\0`` +
    TIFF header + IFD0) carrying the given tags — the fixture-side
    twin of :func:`jpeg_exif_features`, like jpeg_encode is to
    jpeg_decode. IFD0 tags emit in ascending order per TIFF 6.0: Make
    (0x010F, ASCII), Orientation (0x0112, SHORT), DateTime (0x0132,
    ASCII), GPSInfo (0x8825, LONG pointer to the GPS sub-IFD).
    ``gps_lat``/``gps_lon`` (round 12, must come together) are
    ``(ref, deg, minute, sec_num, sec_den)`` — integer DMS stored as
    the standard three RATIONALs. ``thumbnail`` (round 12) hangs an
    IFD1 off IFD0's next-IFD pointer with JPEGInterchangeFormat /
    ...Length pointing at the embedded bytes. ``byte_order`` is
    ``"II"`` (little-endian) or ``"MM"`` (big-endian) — both shapes
    exist in real corpora."""
    import struct

    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    if (gps_lat is None) != (gps_lon is None):
        raise ValueError("gps_lat and gps_lon must come together")
    e = "<" if byte_order == "II" else ">"
    entries = []  # (tag, type, count, packed 4-byte value)
    extra = bytearray()
    # data area begins after: TIFF hdr (8) + count (2) + 12n + next (4)
    n = sum(x is not None for x in (orientation, datetime, make)) + (
        1 if gps_lat is not None else 0
    )
    data_base = 8 + 2 + 12 * n + 4
    if make is not None:
        payload = make.encode("ascii") + b"\x00"
        entries.append(
            (0x010F, 2, len(payload),
             struct.pack(f"{e}I", data_base + len(extra)))
            if len(payload) > 4
            else (0x010F, 2, len(payload), payload.ljust(4, b"\x00"))
        )
        if len(payload) > 4:
            extra += payload
    if orientation is not None:
        entries.append(
            (0x0112, 3, 1, struct.pack(f"{e}HH", orientation, 0))
        )
    if datetime is not None:
        # TIFF 6.0: values that fit in 4 bytes MUST be inline — same
        # branch as Make (r11 ADVICE: a short datetime stored via an
        # offset pointer parsed back as garbage).
        payload = datetime.encode("ascii") + b"\x00"
        entries.append(
            (0x0132, 2, len(payload),
             struct.pack(f"{e}I", data_base + len(extra)))
            if len(payload) > 4
            else (0x0132, 2, len(payload), payload.ljust(4, b"\x00"))
        )
        if len(payload) > 4:
            extra += payload
    if gps_lat is not None:
        # GPS sub-IFD: 4 entries (ref/coord ×2) + next ptr, then the
        # two 3-RATIONAL blocks — 54 + 48 bytes appended to extra
        gps_off = data_base + len(extra)
        rat_base = gps_off + 2 + 4 * 12 + 4
        gifd = bytearray(struct.pack(f"{e}H", 4))
        for tag, val in (
            (0x0001, gps_lat[0]),
            (0x0002, rat_base),
            (0x0003, gps_lon[0]),
            (0x0004, rat_base + 24),
        ):
            if tag in (0x0001, 0x0003):
                raw = str(val).encode("ascii")[:3] + b"\x00"
                gifd += struct.pack(f"{e}HHI", tag, 2, len(raw)) + raw.ljust(
                    4, b"\x00"
                )
            else:
                gifd += struct.pack(f"{e}HHI", tag, 5, 3) + struct.pack(
                    f"{e}I", val
                )
        gifd += struct.pack(f"{e}I", 0)
        for _, d, m_, sn, sd in (gps_lat, gps_lon):
            gifd += struct.pack(f"{e}6I", d, 1, m_, 1, sn, sd)
        entries.append((0x8825, 4, 1, struct.pack(f"{e}I", gps_off)))
        extra += gifd
    ifd1_off = data_base + len(extra) if thumbnail is not None else 0
    tiff = bytearray(byte_order.encode("ascii"))
    tiff += struct.pack(f"{e}H", 42) + struct.pack(f"{e}I", 8)
    tiff += struct.pack(f"{e}H", len(entries))
    for tag, typ, cnt, val in sorted(entries):
        tiff += struct.pack(f"{e}HHI", tag, typ, cnt) + val
    tiff += struct.pack(f"{e}I", ifd1_off)
    tiff += extra
    if thumbnail is not None:
        thumb_off = ifd1_off + 2 + 2 * 12 + 4
        tiff += struct.pack(f"{e}H", 2)
        tiff += struct.pack(f"{e}HHI", 0x0201, 4, 1) + struct.pack(
            f"{e}I", thumb_off
        )
        tiff += struct.pack(f"{e}HHI", 0x0202, 4, 1) + struct.pack(
            f"{e}I", len(thumbnail)
        )
        tiff += struct.pack(f"{e}I", 0)
        tiff += bytes(thumbnail)
    body = b"Exif\x00\x00" + bytes(tiff)
    import struct as _s

    return b"\xff\xe1" + _s.pack(">H", 2 + len(body)) + body


def icc_app2_segment(profile: bytes = b"\x00" * 16) -> bytes:
    """Minimal APP2 ICC_PROFILE segment (chunk 1 of 1) — enough for
    presence detection, which is what curation pipelines key on."""
    import struct

    body = b"ICC_PROFILE\x00" + bytes([1, 1]) + bytes(profile)
    return b"\xff\xe2" + struct.pack(">H", 2 + len(body)) + body


def jpeg_exif_meta(payload: bytes) -> dict:
    """Parse JPEG header metadata WITHOUT decoding pixels: APP1 Exif
    (byte order, Orientation 0x0112, DateTime 0x0132, Make 0x010F
    from IFD0; GPS sub-IFD 0x8825 → signed decimal degrees; IFD1
    thumbnail offset/length, r12), APP2 ICC-profile presence, SOF
    dimensions, and
    whether the frame is progressive (SOF2). Orientation matters:
    values 5-8 transpose the image, so thumbnails / perceptual-dedup
    geometry on a real photo corpus are wrong without it — and it
    costs a ~1 KB header read instead of a decode (the 100 TB triage
    point). Hostile-input hardened: IFD entry count capped, every
    offset bounds-checked, ASCII values capped at 256 bytes; corrupt
    structures degrade to NULL fields, never an exception. Returns
    NULLs-everywhere for non-JPEG payloads."""
    import struct

    out = {
        "has_exif": None, "byte_order": None, "orientation": None,
        "exif_datetime": None, "make": None, "icc_present": None,
        "width": None, "height": None, "progressive": None,
        "gps_lat": None, "gps_lon": None,
        "thumb_offset": None, "thumb_length": None,
    }
    b = bytes(payload)
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return out
    out["has_exif"] = False
    out["icc_present"] = False
    pos, n_seg = 2, 0
    while pos + 4 <= len(b) and n_seg < 64:
        if b[pos] != 0xFF:
            break
        marker = b[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):
            break  # EOI / entropy data: header region over
        n_seg += 1
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        if seglen < 2:
            break
        seg = b[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker in (0xC0, 0xC1, 0xC2) and len(seg) >= 5:
            out["height"], out["width"] = struct.unpack_from(">HH", seg, 1)
            out["progressive"] = marker == 0xC2
        elif marker == 0xE2 and seg.startswith(b"ICC_PROFILE\x00"):
            out["icc_present"] = True
        elif marker == 0xE1 and seg.startswith(b"Exif\x00\x00"):
            t = seg[6:]
            if len(t) < 8 or t[:2] not in (b"II", b"MM"):
                continue
            e = "<" if t[:2] == b"II" else ">"
            try:
                magic, ifd0 = struct.unpack_from(f"{e}HI", t, 2)
                if magic != 42 or ifd0 + 2 > len(t):
                    continue
                (n_ent_raw,) = struct.unpack_from(f"{e}H", t, ifd0)
                n_ent = min(n_ent_raw, 64)  # entry-count bomb cap
                out["has_exif"] = True
                out["byte_order"] = t[:2].decode("ascii")
                gps_off = None
                for i in range(n_ent):
                    off = ifd0 + 2 + 12 * i
                    if off + 12 > len(t):
                        break
                    tag, typ, cnt = struct.unpack_from(f"{e}HHI", t, off)
                    if tag == 0x0112 and typ == 3 and cnt == 1:
                        (v,) = struct.unpack_from(f"{e}H", t, off + 8)
                        out["orientation"] = int(v)
                    elif tag == 0x8825 and typ == 4 and cnt == 1:
                        (gps_off,) = struct.unpack_from(
                            f"{e}I", t, off + 8
                        )
                    elif tag in (0x010F, 0x0132) and typ == 2:
                        if cnt > 256:  # ASCII-length bomb cap
                            continue
                        if cnt <= 4:
                            raw = t[off + 8 : off + 8 + cnt]
                        else:
                            (voff,) = struct.unpack_from(
                                f"{e}I", t, off + 8
                            )
                            if voff + cnt > len(t):
                                continue
                            raw = t[voff : voff + cnt]
                        val = raw.split(b"\x00", 1)[0].decode(
                            "ascii", "replace"
                        )
                        key = "make" if tag == 0x010F else "exif_datetime"
                        out[key] = val
                if gps_off is not None:
                    _exif_parse_gps_ifd(t, gps_off, e, out)
                # IFD1 (thumbnail IFD) hangs off the next-IFD pointer
                # AFTER the real entry table; an entry-bomb header
                # (raw count past the cap) forfeits it — the pointer
                # position is not trustworthy there
                if n_ent_raw <= 64:
                    nxt_at = ifd0 + 2 + 12 * n_ent_raw
                    if nxt_at + 4 <= len(t):
                        (ifd1,) = struct.unpack_from(f"{e}I", t, nxt_at)
                        if 0 < ifd1 and ifd1 + 2 <= len(t):
                            _exif_parse_ifd1(t, ifd1, e, out)
            except struct.error:
                continue
    return out


def _exif_parse_gps_ifd(t: bytes, gps_off: int, e: str, out: dict) -> None:
    """GPS sub-IFD (round 12): GPSLatitudeRef/GPSLatitude and the
    longitude pair (tags 1-4), each coordinate three RATIONALs
    (deg, min, sec) converted to signed decimal degrees
    ``±(d + m/60 + s/3600)`` rounded to 6 — the photo-corpus
    geo-bucketing field. Same hostile-input contract as IFD0: entry
    cap, every offset bounds-checked, zero denominators → NULL."""
    import struct

    if gps_off + 2 > len(t):
        return
    (n_ent,) = struct.unpack_from(f"{e}H", t, gps_off)
    refs: dict[int, str] = {}
    rats: dict[int, tuple] = {}
    for i in range(min(n_ent, 64)):
        off = gps_off + 2 + 12 * i
        if off + 12 > len(t):
            return
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", t, off)
        if tag in (0x0001, 0x0003) and typ == 2 and cnt <= 4:
            raw = t[off + 8 : off + 8 + cnt]
            refs[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif tag in (0x0002, 0x0004) and typ == 5 and cnt == 3:
            (voff,) = struct.unpack_from(f"{e}I", t, off + 8)
            if voff + 24 > len(t):
                continue
            rats[tag] = struct.unpack_from(f"{e}6I", t, voff)
    for ref_tag, val_tag, key, neg in (
        (0x0001, 0x0002, "gps_lat", "S"),
        (0x0003, 0x0004, "gps_lon", "W"),
    ):
        r = rats.get(val_tag)
        if r is None:
            continue
        dn, dd, mn, md, sn, sd = r
        if dd == 0 or md == 0 or sd == 0:
            continue
        v = dn / dd + (mn / md) / 60.0 + (sn / sd) / 3600.0
        if refs.get(ref_tag, "").upper().startswith(neg):
            v = -v
        out[key] = round(v, 6)


def _exif_parse_ifd1(t: bytes, ifd1: int, e: str, out: dict) -> None:
    """IFD1 (round 12): the thumbnail IFD — JPEGInterchangeFormat
    (0x0201, byte offset of the embedded JFIF thumbnail inside the
    TIFF blob) and ...FormatLength (0x0202). Reported only when the
    pair is PRESENT and the span lies inside the segment — a hostile
    offset/length degrades to NULLs, never a read past the buffer."""
    import struct

    (n_ent,) = struct.unpack_from(f"{e}H", t, ifd1)
    toff = tlen = None
    for i in range(min(n_ent, 64)):
        off = ifd1 + 2 + 12 * i
        if off + 12 > len(t):
            return
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", t, off)
        if typ not in (3, 4) or cnt != 1:
            continue
        (v,) = struct.unpack_from(
            f"{e}H" if typ == 3 else f"{e}I", t, off + 8
        )
        if tag == 0x0201:
            toff = int(v)
        elif tag == 0x0202:
            tlen = int(v)
    if (
        toff is not None
        and tlen is not None
        and tlen > 0
        and toff + tlen <= len(t)
    ):
        out["thumb_offset"] = toff
        out["thumb_length"] = tlen


def jpeg_exif_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """EXIF/APPn metadata tier (round 11): per-image header metadata —
    Exif byte order / Orientation / DateTime / Make, ICC presence,
    SOF dimensions, progressive flag — from a pure-bytes marker walk
    that never entropy-decodes. On a real photo corpus this is the
    FIRST curation pass: orientation rewrites thumbnail and
    perceptual-hash geometry, capture time drives dedup windows and
    temporal splits, and it reads ~1 KB per image where a decode
    reads megapixels. Same Arrow-batched ``mapInPandas`` shape as the
    decode tiers; corrupt headers degrade to NULL fields."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    jpeg_exif_row(int(doc_id), bytes(payload))
                    for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
                ]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=JPEG_EXIF_SCHEMA
    )


JPEG_EXIF_SCHEMA = (
    "doc_id long, has_exif boolean, byte_order string, "
    "orientation int, exif_datetime string, make string, "
    "icc_present boolean, width int, height int, "
    "progressive boolean, gps_lat double, gps_lon double, "
    "thumb_offset int, thumb_length int"
)


def jpeg_exif_row(doc_id: int, payload: bytes) -> dict:
    """One JPEG's EXIF metadata row (the :func:`jpeg_exif_features`
    kernel body) — exposed per-row so fixture queries can fuse payload
    build and the marker walk into a single Python boundary
    crossing."""
    row = {"doc_id": int(doc_id)}
    row.update(jpeg_exif_meta(bytes(payload)))
    return row


def apply_exif_orientation(arr, orientation: int | None):
    """Apply a TIFF/Exif orientation (1-8) to an (h, w, c) array —
    the transform every correct thumbnailer must run before hashing
    or display: 2/4 mirror, 3 rotates 180°, 5-8 TRANSPOSE the
    geometry (90°/270° rotations and the two diagonal flips), so
    width/height swap. None or out-of-range values are treated as 1
    (the Exif default)."""
    o = orientation if orientation in range(1, 9) else 1
    if o == 2:
        return arr[:, ::-1]
    if o == 3:
        return arr[::-1, ::-1]
    if o == 4:
        return arr[::-1, :]
    t = arr.transpose(1, 0, *range(2, arr.ndim))
    if o == 5:
        return t
    if o == 6:  # rotate 90 CW
        return t[:, ::-1]
    if o == 7:
        return t[::-1, ::-1]
    if o == 8:  # rotate 90 CCW
        return t[::-1, :]
    return arr


def jpeg_oriented_thumbnail_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Orientation-corrected 1/8-scale thumbnails (round 11): the
    composition a real photo-corpus pipeline actually runs — parse
    the Exif Orientation from APP1 (:func:`jpeg_exif_meta`), decode
    the DC-only preview (:func:`jpeg_decode` ``dc_only=True``), and
    apply the orientation transform BEFORE any downstream hashing:
    orientations 5-8 transpose the image, so perceptual hashes,
    ahash-dedup, and display previews computed on the raw decode are
    simply wrong for a quarter of real phone photos. One row per
    image: the parsed orientation (NULL when absent → identity), the
    post-transform dimensions, channel sums (invariant under the
    isometry — a self-check the oracle exploits) and the
    post-transform top-left pixel (which corner lands there IS the
    orientation semantics). Unsupported/corrupt payloads yield NULL
    rows; Arrow-batched ``mapInPandas``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    jpeg_oriented_thumb_row(int(doc_id), bytes(payload))
                    for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
                ]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=JPEG_ORIENTED_THUMB_SCHEMA
    )


JPEG_ORIENTED_THUMB_SCHEMA = (
    "doc_id long, orientation int, thumb_w int, thumb_h int, "
    "sum_r long, sum_g long, sum_b long, "
    "px00_r int, px00_g int, px00_b int"
)


def jpeg_oriented_thumb_row(doc_id: int, payload: bytes) -> dict:
    """One JPEG's orientation-corrected thumbnail row (the
    :func:`jpeg_oriented_thumbnail_features` kernel body) — exposed
    per-row so fixture queries can fuse payload build and decode into
    a single Python boundary crossing."""
    row = {
        "doc_id": int(doc_id), "orientation": None,
        "thumb_w": None, "thumb_h": None,
        "sum_r": None, "sum_g": None, "sum_b": None,
        "px00_r": None, "px00_g": None, "px00_b": None,
    }
    try:
        b = bytes(payload)
        meta = jpeg_exif_meta(b)
        rgb, _ = jpeg_decode(b, dc_only=True)
        rgb = apply_exif_orientation(rgb, meta["orientation"])
        th, tw = rgb.shape[:2]
        row.update(
            orientation=meta["orientation"],
            thumb_w=int(tw), thumb_h=int(th),
            sum_r=int(rgb[:, :, 0].sum(dtype="int64")),
            sum_g=int(rgb[:, :, 1].sum(dtype="int64")),
            sum_b=int(rgb[:, :, 2].sum(dtype="int64")),
            px00_r=int(rgb[0, 0, 0]),
            px00_g=int(rgb[0, 0, 1]),
            px00_b=int(rgb[0, 0, 2]),
        )
    except Exception:
        pass
    return row


def jpeg_thumbnail_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """1/8-scale JPEG thumbnails straight from the DC coefficients
    (round 10) — the REAL library-free resize path every thumbnailer
    and vision-data pipeline uses for JPEG corpora: the DC term of
    each 8x8 block is 8x the block mean, so a (ceil(h/8), ceil(w/8))
    preview falls out of the entropy decode with no IDCT and no
    full-resolution pixel materialization — at 100 TB that is the
    difference between shipping previews and shipping the corpus.
    Unsupported/corrupt payloads yield NULL rows, same contract as
    the full decoder.

    One row per image: thumbnail dimensions plus per-channel sums and
    the top-left thumb pixel (decode-sensitive: a DC-prediction slip
    anywhere moves the sums). Arrow-batched ``mapInPandas``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    jpeg_thumb_row(int(doc_id), bytes(payload))
                    for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
                ]
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=JPEG_THUMB_SCHEMA
    )


JPEG_THUMB_SCHEMA = (
    "doc_id long, thumb_w int, thumb_h int, n_components int, "
    "sum_r long, sum_g long, sum_b long, "
    "px00_r int, px00_g int, px00_b int"
)


def jpeg_thumb_row(doc_id: int, payload: bytes) -> dict:
    """One JPEG's DC-thumbnail feature row (the
    :func:`jpeg_thumbnail_features` kernel body) — exposed per-row so
    fixture queries can fuse payload build and decode into a single
    Python boundary crossing."""
    row = {
        "doc_id": int(doc_id), "thumb_w": None,
        "thumb_h": None, "n_components": None,
        "sum_r": None, "sum_g": None, "sum_b": None,
        "px00_r": None, "px00_g": None, "px00_b": None,
    }
    try:
        rgb, nc = jpeg_decode(bytes(payload), dc_only=True)
        th, tw = rgb.shape[:2]
        row.update(
            thumb_w=int(tw), thumb_h=int(th),
            n_components=int(nc),
            sum_r=int(rgb[:, :, 0].sum(dtype="int64")),
            sum_g=int(rgb[:, :, 1].sum(dtype="int64")),
            sum_b=int(rgb[:, :, 2].sum(dtype="int64")),
            px00_r=int(rgb[0, 0, 0]),
            px00_g=int(rgb[0, 0, 1]),
            px00_b=int(rgb[0, 0, 2]),
        )
    except Exception:
        pass
    return row
