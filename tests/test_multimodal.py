"""Multimodal plumbing tests (X6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from vectordb_migrator_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    fake_decoder,
    sample_frames,
)


def test_payload_schema(documents):
    d = attach_payload(documents)
    assert d.schema["payload"].dataType.typeName() == "binary"
    row = d.first()
    assert row["media_meta"]["modality"] == "text"
    assert row["media_meta"]["n_bytes"] == len(row["payload"])


def test_feature_extraction(documents):
    feats = extract_features(attach_payload(documents.limit(20)), decoder=fake_decoder)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["feature"]) == 4 and r["checksum"] >= 0
        assert r["n_bytes"] == int(r["feature"][0])


def test_default_decoder_is_real_and_rejects_non_images(documents):
    # the default decoder is now the REAL decode_image: text payloads
    # are not images, so it raises explicitly (never silently wrong)
    feats = extract_features(attach_payload(documents.limit(1)))
    with pytest.raises(PythonException, match="ValueError"):
        feats.collect()


def test_extract_features_decodes_real_jpeg_payloads(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        decode_image,
        jpeg_encode,
    )

    px = np.full((8, 16), 77, np.uint8)
    payload = jpeg_encode(px)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    ).select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/jpeg").alias("mime"),
            F.octet_length("payload").alias("n_bytes"),
        ).alias("media_meta"),
    )
    r = extract_features(df).first()  # default decoder = decode_image
    assert r["feature"][:3] == [16.0, 8.0, 1.0]
    # gray 77 everywhere: luma == 77, checksum matches local decode
    assert abs(r["feature"][3] - 77.0) < 1e-6
    assert r["checksum"] == decode_image(payload)["checksum"]


def test_frame_sampling_deterministic(documents):
    d = attach_payload(documents)
    a = sorted(r["doc_id"] for r in sample_frames(d, every_n=10).collect())
    b = sorted(r["doc_id"] for r in sample_frames(d, every_n=10).collect())
    assert a == b and 0 < len(a) < 500


def test_explode_frames_codegen(spark):
    from vectordb_migrator_spark.operators.multimodal import (
        attach_payload,
        explode_frames,
    )

    df = attach_payload(
        spark.createDataFrame(
            [(1, "a" * 10), (2, "b" * 4), (3, "")], ["doc_id", "text"]
        )
    )
    rows = explode_frames(df, frame_size=4).collect()
    out = {(r["doc_id"], r["frame_id"]): r for r in rows}
    # 10 bytes @ 4 → frames of 4,4,2; 4 bytes → one frame; empty → none
    assert sorted(out) == [(1, 0), (1, 1), (1, 2), (2, 0)]
    assert out[(1, 2)]["frame_bytes"] == 2
    assert bytes(out[(1, 0)]["frame"]) == b"aaaa"
    assert bytes(out[(1, 2)]["frame"]) == b"aa"
    # no Python in the plan — whole-stage codegen only
    plan = (
        explode_frames(df, frame_size=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_resize_media_plumbing(spark):
    import pytest

    from vectordb_migrator_spark.operators.multimodal import (
        attach_payload,
        fake_resizer,
        resize_media,
    )

    df = attach_payload(
        spark.createDataFrame([(1, "abcdefgh"), (2, "xy")], ["doc_id", "text"])
    )
    out = {r["doc_id"]: r for r in resize_media(
        df, target_bytes=4, resizer=fake_resizer
    ).collect()}
    assert bytes(out[1]["payload"]) == b"abcd"          # truncated
    assert bytes(out[2]["payload"]) == b"xy\0\0"        # zero-padded
    assert out[1]["media_meta"]["n_bytes"] == 4
    assert out[2]["media_meta"]["n_bytes"] == 4
    with pytest.raises(NotImplementedError):
        resize_media(df, target_bytes=4)  # honest stub without a lib


def _png(w, h):
    import struct
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00")


def _gif(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp(w, h):
    import struct
    return (b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
            + struct.pack("<ii", w, h) + b"\x00" * 8)


def _jpeg(w, h):
    import struct
    # SOI + APP0 (JFIF) + SOF0 carrying the dimensions
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_image_header_info_parses_real_headers(spark):
    """Round-6: format + dimensions from binary headers in pure
    codegen — real byte layouts (PNG/GIF/BMP), no decoder library."""
    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.multimodal import (
        image_header_info,
    )

    rows = [
        (1, bytearray(_png(640, 480))),
        (2, bytearray(_gif(320, 200))),
        (3, bytearray(_bmp(800, 600))),
        (4, bytearray(b"plain text, not an image")),
        (5, bytearray(_jpeg(100, 50))),  # variable offset -> unknown here
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    got = {
        r["id"]: (r["i"]["format"], r["i"]["width"], r["i"]["height"])
        for r in df.select(
            "id", image_header_info(F.col("payload")).alias("i")
        ).collect()
    }
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("gif", 320, 200)
    assert got[3] == ("bmp", 800, 600)
    assert got[4] == ("unknown", None, None)
    assert got[5] == ("unknown", None, None)


def test_jpeg_dimensions_marker_scan(spark):
    """JPEG dims come from the SOF marker at a variable offset — the
    mapInPandas scan finds them past APP segments; non-JPEG rows are
    NULL and every other column passes through."""
    from vectordb_migrator_spark.operators.multimodal import jpeg_dimensions

    rows = [
        (1, bytearray(_jpeg(1920, 1080)), "a"),
        (2, bytearray(_jpeg(64, 32)), "b"),
        (3, bytearray(_png(10, 10)), "c"),
        (4, bytearray(b"\xff\xd8\xff"), "d"),  # truncated header
    ]
    df = spark.createDataFrame(rows, "id int, payload binary, tag string")
    got = {
        r["id"]: (r["jpeg_width"], r["jpeg_height"], r["tag"])
        for r in jpeg_dimensions(df).collect()
    }
    assert got[1] == (1920, 1080, "a")
    assert got[2] == (64, 32, "b")
    assert got[3] == (None, None, "c")
    assert got[4] == (None, None, "d")


def test_audio_header_info_real_wav_flac_and_unknown(spark):
    """Round-7 X6: the WAV branch parses bytes written by the stdlib
    `wave` encoder (ground truth, not our own synthesis); the FLAC
    branch parses a spec-packed STREAMINFO; compressed containers
    route to 'unknown'."""
    import io
    import wave as wave_mod

    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.multimodal import (
        audio_header_info,
    )

    buf = io.BytesIO()
    w = wave_mod.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(22050)
    w.writeframes(b"\x00\x00" * 2 * 500)  # 500 frames
    w.close()
    wav_bytes = buf.getvalue()

    # FLAC: fLaC + last-block STREAMINFO(34): rate=44100, ch=1,
    # bits=16, total_samples=88200 (exactly 2 s)
    rate, ch, bits, total = 44100, 1, 16, 88200
    packed = bytes(
        [
            rate >> 12,
            (rate >> 4) & 0xFF,
            ((rate & 0xF) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4),
            (((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF),
            (total >> 24) & 0xFF,
            (total >> 16) & 0xFF,
            (total >> 8) & 0xFF,
            total & 0xFF,
        ]
    )
    flac_bytes = (
        b"fLaC" + bytes([0x80, 0, 0, 34])
        + bytes([0x10, 0x00, 0x10, 0x00]) + b"\x00" * 6
        + packed + b"\x00" * 16
    )

    df = spark.createDataFrame(
        [(1, bytearray(wav_bytes)), (2, bytearray(flac_bytes)),
         (3, bytearray(b"ID3\x04rubbish"))],
        "id long, payload binary",
    )
    rows = {
        r["id"]: r["i"].asDict()
        for r in df.select("id", audio_header_info(F.col("payload")).alias("i")).collect()
    }
    assert rows[1] == {
        "format": "wav", "sample_rate": 22050, "channels": 2,
        "bits": 16, "duration_ms": int(2000 * 8000 / (22050 * 2 * 16)),
    }
    assert rows[1]["duration_ms"] == 22  # 500 frames / 22050 Hz
    assert rows[2] == {
        "format": "flac", "sample_rate": 44100, "channels": 1,
        "bits": 16, "duration_ms": 2000,
    }
    assert rows[3]["format"] == "unknown"
    assert rows[3]["duration_ms"] is None


def test_video_header_info_mp4_avi_ebml_unknown(spark):
    """Round-7 X6: MP4 brand + canonical-faststart mvhd duration,
    a NON-canonical mp4 (mdat before moov) degrades to NULL duration
    instead of mis-parsing, AVI fixed-offset fields, EBML magic, and
    the unknown fallback."""
    import struct

    from pyspark.sql import functions as F

    from vectordb_migrator_spark.operators.multimodal import (
        video_header_info,
    )

    def box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", 600, 3600),  # timescale, duration (6 s)
    )
    canonical = (
        box(b"ftyp", b"isom" + b"\x00\x00\x00\x00")
        + box(b"moov", mvhd)
    )
    # mdat between ftyp and moov — duration must be NULL, brand kept
    noncanon = (
        box(b"ftyp", b"mp42" + b"\x00\x00\x00\x00")
        + box(b"mdat", b"\x00" * 16)
        + box(b"moov", mvhd)
    )
    avih = (
        b"avih"
        + struct.pack("<I", 56)
        + struct.pack(
            "<IIIIIIIIII",
            40000,  # us/frame (25 fps)
            0, 0, 0,
            250,  # total frames (10 s)
            0, 1, 0,
            640, 480,
        )
    )
    avi = b"RIFF" + b"\x00" * 4 + b"AVI LIST" + b"\x00" * 4 + b"hdrl" + avih
    ebml = b"\x1a\x45\xdf\xa3" + b"\x00" * 8
    rows = [
        (1, canonical),
        (2, noncanon),
        (3, avi),
        (4, ebml),
        (5, b"\x00\x01\x02\x03garbage"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {
        r["id"]: (
            r["i"]["format"],
            r["i"]["brand"],
            r["i"]["width"],
            r["i"]["height"],
            r["i"]["duration_ms"],
        )
        for r in df.select(
            "id", video_header_info(F.col("payload")).alias("i")
        ).collect()
    }
    assert got[1] == ("mp4", "isom", None, None, 6000)
    assert got[2] == ("mp4", "mp42", None, None, None)
    assert got[3] == ("avi", None, 640, 480, 10000)
    assert got[4] == ("ebml", None, None, None, None)
    assert got[5] == ("unknown", None, None, None, None)


def test_wav_pcm_features_real_decode(spark):
    """Real stdlib-encoded WAV bytes decode end to end: a square wave
    reports RMS == amplitude, exact zero-crossing count, duration from
    the true frame count; stereo reads channel 0; corrupt payloads
    yield NULLs instead of failing."""
    import io
    import wave

    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        wav_pcm_features,
    )

    def wav_bytes(samples, sr=8000, channels=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(sr)
            arr = np.asarray(samples, dtype="<i2")
            if channels == 2:
                arr = np.column_stack([arr, np.zeros_like(arr)]).ravel()
            w.writeframes(arr.tobytes())
        return buf.getvalue()

    h, A, n = 8, 2000, 160  # half-period 8 -> crossings = (n-1)//h
    sq = [A if (i // h) % 2 == 0 else -A for i in range(n)]
    rows = [
        (1, bytearray(wav_bytes(sq))),
        (2, bytearray(wav_bytes(sq, channels=2))),
        (3, bytearray(b"not a wav")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in wav_pcm_features(df).collect()}

    r1 = got[1]
    assert (r1["sample_rate"], r1["channels"], r1["n_samples"]) == (
        8000, 1, n,
    )
    assert r1["duration_ms"] == n * 1000 // 8000
    assert r1["rms"] == float(A)  # square wave: every sample is +/-A
    assert r1["peak"] == A
    assert r1["zero_crossings"] == (n - 1) // h

    r2 = got[2]
    assert r2["channels"] == 2 and r2["rms"] == float(A)  # channel 0

    r3 = got[3]
    assert r3["sample_rate"] is None and r3["rms"] is None


def _bmp_bytes(w, h, px_fn):
    """Minimal bottom-up 24-bit BMP writer (BGR, 4-byte row padding)."""
    import struct

    stride = (w * 3 + 3) // 4 * 4
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            b, g, r = px_fn(x, y)
            row += bytes((b, g, r))
        row += b"\x00" * (stride - len(row))
        data += row
    size = 54 + len(data)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return bytes(hdr + info + data)


def test_bmp_decode_features_real_decode(spark):
    """Real BMP bytes decode end to end: per-channel means match the
    planted gradients exactly, the top-left pixel proves bottom-up
    row flipping, odd widths exercise row padding, and corrupt
    payloads yield NULLs."""
    from vectordb_migrator_spark.operators.multimodal import (
        bmp_decode_features,
    )

    w, h, A = 15, 6, 200  # w*3=45 -> 3 pad bytes per row

    def px(x, y):
        return (x, y * 3, A)  # b=x, g=3y, r=const

    rows = [
        (1, bytearray(_bmp_bytes(w, h, px))),
        (2, bytearray(b"nope")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in bmp_decode_features(df).collect()}

    r1 = got[1]
    assert (r1["width"], r1["height"], r1["n_pixels"]) == (w, h, w * h)
    assert r1["mean_b"] == (w - 1) / 2
    assert r1["mean_g"] == 3 * (h - 1) / 2
    assert r1["mean_r"] == float(A)
    # top-left pixel is y=0 -> g=0; an unflipped decoder would read
    # the bottom row (g = 3*(h-1)) here
    assert (r1["px00_b"], r1["px00_g"], r1["px00_r"]) == (0, 0, A)
    assert got[2]["width"] is None


def test_png_filter_bytes_match_rfc2083_formulas():
    """Spec-pinned encoder check (breaks encoder/decoder shared-bug
    symmetry): forward-filtered bytes for tiny hand rows equal the
    RFC 2083 §6 difference formulas computed by hand."""
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        _png_filter_row,
    )

    line = np.array([10, 20, 40, 70], dtype=np.uint8)
    prev = np.array([5, 10, 15, 20], dtype=np.uint8)
    # Sub (bpp=1): x - left -> [10, 10, 20, 30]
    assert _png_filter_row(line, prev, 1, 1).tolist() == [10, 10, 20, 30]
    # Up: x - up -> [5, 10, 25, 50]
    assert _png_filter_row(line, prev, 1, 2).tolist() == [5, 10, 25, 50]
    # Average: x - floor((left+up)/2) -> [10-2, 20-10, 40-17, 70-30]
    assert _png_filter_row(line, prev, 1, 3).tolist() == [8, 10, 23, 40]
    # Paeth: predictors are 5, 10, 20, 40 (hand Paeth) -> deltas
    assert _png_filter_row(line, prev, 1, 4).tolist() == [5, 10, 20, 30]
    # modulo-256 wrap
    wrap = np.array([1, 0], dtype=np.uint8)
    assert _png_filter_row(wrap, np.zeros(2, np.uint8), 1, 1).tolist() == [
        1,
        255,
    ]


def test_png_roundtrip_all_filters_and_color_types():
    """Encode → decode returns the exact pixel array for every filter
    type and every supported color type; filtered streams decode to
    the SAME pixels as the filter-0 stream of the same image."""
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        _PNG_SIG,
        _png_unfilter,
        png_encode,
    )

    rng = np.random.default_rng(42)

    def decode_px(b, w, h, ch):
        import struct
        import zlib

        pos, idat = 8, bytearray()
        while pos + 8 <= len(b):
            ln = struct.unpack_from(">I", b, pos)[0]
            tag = b[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += b[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        raw = zlib.decompress(bytes(idat))
        return _png_unfilter(raw, h, w * ch, ch).reshape(h, w, ch)

    for ct, ch in [(0, 1), (4, 2), (2, 3), (6, 4)]:
        px = rng.integers(0, 256, (7, 5, ch), dtype=np.uint8)
        base = png_encode(px, color_type=ct)  # all filter 0
        assert base[:8] == _PNG_SIG
        np.testing.assert_array_equal(decode_px(base, 5, 7, ch), px)
        for ft in (1, 2, 3, 4):
            enc = png_encode(px, color_type=ct, row_filters=[ft])
            np.testing.assert_array_equal(decode_px(enc, 5, 7, ch), px)
        mixed = png_encode(px, color_type=ct, row_filters=[0, 1, 2, 3, 4])
        np.testing.assert_array_equal(decode_px(mixed, 5, 7, ch), px)


def test_png_decode_features_real_and_degenerate(spark):
    """The Spark kernel: real RGB and gray PNGs decode to closed-form
    stats; 16-bit, palette, interlaced, and corrupt payloads yield
    NULL features, never a misparse or a failed pass."""
    import struct
    import zlib

    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        _PNG_SIG,
        png_decode_features,
        png_encode,
    )

    w, h = 6, 4
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[:, :, 0] = 9
    rgb[:, :, 1] = np.arange(w)[None, :]
    rgb[:, :, 2] = np.arange(h)[:, None]
    gray = (np.arange(w)[None, :] + np.arange(h)[:, None]).astype(np.uint8)

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    bad_depth = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + chunk(b"IEND", b"")
    )
    interlaced = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + chunk(b"IEND", b"")
    )
    rows = [
        (1, bytearray(png_encode(rgb, color_type=2, row_filters=[4, 3, 2, 1]))),
        (2, bytearray(png_encode(gray, color_type=0, row_filters=[1, 2]))),
        (3, bytearray(bad_depth)),
        (4, bytearray(interlaced)),
        (5, bytearray(b"\x89PNG but not really")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in png_decode_features(df).collect()}
    r1 = got[1]
    assert (r1["width"], r1["height"], r1["channels"]) == (6, 4, 3)
    assert r1["mean_r"] == 9.0
    assert r1["mean_g"] == (w - 1) / 2 and r1["mean_b"] == (h - 1) / 2
    assert (r1["px00_r"], r1["px00_g"], r1["px00_b"]) == (9, 0, 0)
    r2 = got[2]
    assert r2["channels"] == 1
    assert r2["mean_r"] == r2["mean_g"] == (w - 1) / 2 + (h - 1) / 2
    assert (r2["px00_r"], r2["px00_g"], r2["px00_b"]) == (0, 0, 0)
    for d in (3, 4, 5):
        assert got[d]["width"] is None and got[d]["mean_r"] is None


def test_thumbnail_features_exact_sampling(spark):
    """Nearest-neighbor 4x4 resize: exact src=(dst*size)//4 sampling
    on a hand-built gradient BMP; undecodable payloads yield NULLs."""
    import struct

    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        thumbnail_features,
    )

    w, h = 10, 6
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(w)[None, :]          # b = x
    px[:, :, 1] = (2 * np.arange(h))[:, None]    # g = 2y
    px[:, :, 2] = 9                              # r const
    stride = (w * 3 + 3) // 4 * 4
    data = np.zeros((h, stride), dtype=np.uint8)
    data[:, : w * 3] = px[::-1].reshape(h, w * 3)
    body = data.tobytes()
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    rows = [
        (1, bytearray(hdr + info + body)),
        (2, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in thumbnail_features(df, thumb=4).collect()}

    xi = [(j * w) // 4 for j in range(4)]   # 0,2,5,7
    yi = [(i * h) // 4 for i in range(4)]   # 0,1,3,4
    want = []
    for y in yi:
        for x in xi:
            want += [9, 2 * y, x]  # RGB
    assert got[1]["tw"] == got[1]["th"] == 4
    assert got[1]["thumb_csv"] == ",".join(str(v) for v in want)
    assert got[2]["thumb_csv"] is None and got[2]["tw"] is None


def test_ahash_features_integer_exact(spark):
    """aHash bits = integer 'above mean' on the 4x4 gray thumb; a
    brightness shift (+c on every channel) leaves the hash invariant;
    undecodable payloads yield NULL."""
    import struct

    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import ahash_features

    def bmp(px):
        h, w = px.shape[:2]
        stride = (w * 3 + 3) // 4 * 4
        data = np.zeros((h, stride), dtype=np.uint8)
        data[:, : w * 3] = px[::-1].reshape(h, w * 3)
        body = data.tobytes()
        hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
            2835, 2835, 0, 0,
        )
        return bytearray(hdr + info + body)

    w, h = 8, 8
    base = np.zeros((h, w, 3), dtype=np.uint8)
    base[:, :, 0] = (10 * np.arange(w))[None, :]   # strong x gradient
    shifted = np.clip(base.astype(int) + 40, 0, 255).astype(np.uint8)
    rows = [
        (1, bmp(base)),
        (2, bmp(shifted)),
        (3, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["ahash"] for r in ahash_features(df).collect()}

    xi = [(j * w) // 4 for j in range(4)]
    gray = [10 * x for x in xi] * 4          # rows identical
    tot = sum(gray)
    want = "".join("1" if g * 16 > tot else "0" for g in gray)
    assert got[1] == want
    assert got[2] == got[1]          # brightness-shift invariant
    assert got[3] is None
    assert set(got[1]) == {"0", "1"} and len(got[1]) == 16


def test_gif_lzw_spec_pin_and_roundtrip():
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        gif_lzw_decode,
        gif_lzw_encode,
    )

    # Hand-derived spec pin, 7 zeros at min-code-size 2 (CLEAR=4,
    # EOI=5): codes [4,0,6,7,0,5]. The encoder's table is one entry
    # ahead of the decoder's at transmit time, so width covers
    # (encoder_table_size - 1): grow on next_code > 2^width. Code 7
    # is emitted at 3 bits (table size 8 -> max referencable 7), the
    # codes after at 4. LSB-first packing:
    #   001 000 011 111 | 0000 1010 -> 0x84 0x0F 0x05
    assert gif_lzw_encode([0] * 7, 2) == bytes([0x84, 0x0F, 0x05])

    rng = np.random.RandomState(0)
    cases = [
        (2, [0] * 7),
        (2, [3] * 10000),                    # cScSc repeatedly
        (2, list(rng.randint(0, 4, 500))),
        (4, list(rng.randint(0, 16, 5000))), # width growth to >9 bits
        (4, list(range(16)) * 300),
        (2, [0]),
    ]
    for mcs, seq in cases:
        assert gif_lzw_decode(gif_lzw_encode(seq, mcs), mcs) == [
            int(x) for x in seq
        ]


def test_gif_lzw_decodes_public_sample_stream():
    from vectordb_migrator_spark.operators.multimodal import gif_lzw_decode

    # Image-data bytes of the canonical 10x10 sample GIF documented
    # in Matthew Flickinger's "What's In A GIF" walkthrough (public
    # reference bytes, produced by a real-world encoder) — true
    # interop evidence independent of this module's encoder.
    data = bytes.fromhex("8C2D99872A1CDC33A00275EC95FAA8DE608C04914C0100")
    out = gif_lzw_decode(data, 2)
    assert len(out) == 100
    rows = [out[i * 10 : (i + 1) * 10] for i in range(10)]
    assert rows[0] == [1, 1, 1, 1, 1, 2, 2, 2, 2, 2]
    assert rows[3] == [1, 1, 1, 0, 0, 0, 0, 2, 2, 2]
    assert rows[5] == [2, 2, 2, 0, 0, 0, 0, 1, 1, 1]
    assert rows[9] == [2, 2, 2, 2, 2, 1, 1, 1, 1, 1]


def test_gif_decode_features_roundtrip_and_corruption(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        gif_decode_features,
        gif_encode,
    )

    pal8 = [(7 * i, 11 * i, 13 * i) for i in range(8)]
    idx = (np.arange(6)[None, :] + np.arange(4)[:, None] + 3) % 8
    payload = gif_encode(idx, pal8)
    # header sanity: GIF87a magic + global color table flag
    assert payload[:6] == b"GIF87a" and payload[10] & 0x80

    rows = [
        (1, bytearray(payload)),
        (2, bytearray(payload[: len(payload) // 2])),  # truncated
        (3, bytearray(b"not a gif at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in gif_decode_features(df).collect()}

    ok = got[1]
    assert (ok["width"], ok["height"], ok["n_colors"]) == (6, 4, 8)
    assert ok["n_pixels"] == 24
    assert ok["idx_sum"] == int(idx.sum())
    assert ok["sum_r"] == 7 * int(idx.sum())
    assert ok["sum_g"] == 11 * int(idx.sum())
    assert ok["sum_b"] == 13 * int(idx.sum())
    assert (ok["px00_r"], ok["px00_g"], ok["px00_b"]) == (21, 33, 39)

    for bad in (2, 3):
        assert got[bad]["width"] is None and got[bad]["idx_sum"] is None


def test_tar_codec_interop_with_system_tar(tmp_path):
    import subprocess

    from vectordb_migrator_spark.operators.multimodal import tar_encode

    # our writer -> system tar reads it
    b = tar_encode(
        [("docs/a.txt", b"hello world"), ("docs/b.bin", bytes(range(256)) * 3)]
    )
    p = tmp_path / "ours.tar"
    p.write_bytes(b)
    out = subprocess.run(
        ["tar", "-tvf", str(p)], capture_output=True, text=True
    )
    assert out.returncode == 0
    assert "docs/a.txt" in out.stdout and "docs/b.bin" in out.stdout
    assert " 11 " in out.stdout and " 768 " in out.stdout


def test_tar_walker_reads_system_tar_and_flags_corruption(spark, tmp_path):
    import hashlib
    import subprocess

    from vectordb_migrator_spark.operators.multimodal import (
        tar_members_features,
    )

    d = tmp_path / "src"
    d.mkdir()
    (d / "one.txt").write_bytes(b"alpha beta")
    (d / "two.txt").write_bytes(b"g" * 1000)
    tarp = tmp_path / "sys.tar"
    subprocess.run(
        ["tar", "--format=ustar", "-cf", str(tarp), "-C", str(tmp_path),
         "src"],
        check=True,
    )
    good = tarp.read_bytes()
    # corrupt a header byte inside the SECOND member's checksum region
    bad = bytearray(good)
    bad[512 * 1 + 0] ^= 0xFF  # flip first byte of a later header block
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bad)],
        "shard_id long, payload binary",
    )
    rows = tar_members_features(df).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    ok = {r["member_name"]: r for r in by_shard[1]}
    assert ok["src/one.txt"]["size"] == 10
    assert ok["src/one.txt"]["content_md5"] == hashlib.md5(
        b"alpha beta"
    ).hexdigest()
    assert all(r["checksum_ok"] for r in by_shard[1])
    # the corrupted shard: some member flags checksum_ok == False
    # (or parses fewer members) — never a silent pass
    flags = [r["checksum_ok"] for r in by_shard[2]]
    assert (False in flags) or len(by_shard[2]) < len(by_shard[1])


def test_zip_codec_interop_with_stdlib_zipfile(spark):
    import io
    import zipfile

    from vectordb_migrator_spark.operators.multimodal import (
        zip_encode,
        zip_members_features,
    )

    # our writer -> stdlib zipfile validates (testzip checks CRCs)
    b = zip_encode(
        [("a.txt", b"hello world" * 10), ("b.bin", bytes(range(256)))],
        compress=lambda n, p: n.endswith(".txt"),
    )
    zf = zipfile.ZipFile(io.BytesIO(b))
    assert zf.namelist() == ["a.txt", "b.bin"]
    assert zf.read("a.txt") == b"hello world" * 10
    assert zf.read("b.bin") == bytes(range(256))
    assert zf.testzip() is None
    assert [zf.getinfo(n).compress_type for n in zf.namelist()] == [8, 0]

    # stdlib writer -> our walker reads and CRC-verifies it; a flipped
    # byte inside a deflate stream must flag, never pass silently
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        out.writestr("x/one.txt", b"alpha beta", zipfile.ZIP_DEFLATED)
        out.writestr("x/two.bin", b"g" * 1000, zipfile.ZIP_STORED)
    good = buf.getvalue()
    bad = bytearray(good)
    # corrupt one byte of the stored member's payload region
    bad[good.find(b"g" * 10) + 3] ^= 0xFF
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bad)],
        "shard_id long, payload binary",
    )
    rows = zip_members_features(df).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    ok = {r["member_name"]: r for r in by_shard[1]}
    assert ok["x/one.txt"]["method"] == 8 and ok["x/one.txt"]["size"] == 10
    assert ok["x/two.bin"]["method"] == 0 and ok["x/two.bin"]["size"] == 1000
    assert all(r["crc_ok"] for r in by_shard[1])
    flags = [r["crc_ok"] for r in by_shard[2]]
    assert False in flags or None in flags


def test_tar_walker_reassembles_ustar_prefix_for_long_paths(spark, tmp_path):
    import hashlib
    import subprocess

    from vectordb_migrator_spark.operators.multimodal import (
        tar_members_features,
    )

    # a path longer than the 100-char name field: system tar (ustar
    # format) splits it across prefix + name — the walker must
    # reassemble prefix + '/' + name, never a silent truncation
    # (r9 ADVICE)
    deep = "/".join(["component%02d" % i for i in range(12)])  # ~130 chars
    d = tmp_path / deep
    d.mkdir(parents=True)
    (d / "leaf.txt").write_bytes(b"payload at depth")
    tarp = tmp_path / "deep.tar"
    subprocess.run(
        ["tar", "--format=ustar", "-cf", str(tarp), "-C", str(tmp_path),
         "component00"],
        check=True,
    )
    df = spark.createDataFrame(
        [(1, bytearray(tarp.read_bytes()))], "shard_id long, payload binary"
    )
    rows = {r["member_name"]: r for r in tar_members_features(df).collect()}
    full = deep + "/leaf.txt"
    assert len(full) > 100
    assert full in rows
    assert rows[full]["checksum_ok"] is True
    assert rows[full]["content_md5"] == hashlib.md5(
        b"payload at depth"
    ).hexdigest()


# ------------------------------------------------------------------ JPEG


def test_jpeg_gray_block_constant_roundtrip_exact():
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    # block-constant gray with Q=1 is DC-only: the whole pipeline
    # (FDCT, quantize, Huffman, unstuff, IDCT) is integer-exact
    px = np.zeros((18, 21), np.uint8)
    for by in range(3):
        for bx in range(3):
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                37 * bx + 59 * by + 5
            ) % 256
    rgb, nc = jpeg_decode(jpeg_encode(px))
    assert nc == 1 and rgb.shape == (18, 21, 3)
    assert np.array_equal(rgb[:, :, 0], px)
    assert np.array_equal(rgb[:, :, 1], px)  # gray replicates channels


def test_jpeg_ac_path_matches_direct_formula_replica():
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    got = jpeg_decode(jpeg_encode(px))[0][:, :, 0].astype(float)

    # independent replica: direct 4-loop DCT/IDCT per the T.81
    # formulas (the engine uses a vectorized matrix form)
    def dct2(s):
        out = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                cv = 1 / np.sqrt(2) if v == 0 else 1.0
                acc = 0.0
                for x in range(8):
                    for y in range(8):
                        acc += (
                            s[x, y]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[u, v] = cu * cv * acc / 4
        return out

    def idct2(S):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                acc = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        acc += (
                            cu
                            * cv
                            * S[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[x, y] = acc / 4
        return out

    def rh(a):
        return np.sign(a) * np.floor(np.abs(a) + 0.5)

    exp = np.zeros((16, 16))
    for by in range(2):
        for bx in range(2):
            blk = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                float
            ) - 128
            q = rh(dct2(blk))
            exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                rh(idct2(q)) + 128, 0, 255
            )
    assert np.array_equal(got, exp)


def test_jpeg_color_and_restart_markers():
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (10, 13, 3)).astype(np.uint8)
    rgb, nc = jpeg_decode(jpeg_encode(px))
    assert nc == 3 and rgb.shape == (10, 13, 3)
    # YCbCr round trip is lossy but tightly bounded with Q=1
    assert int(np.max(np.abs(rgb.astype(int) - px.astype(int)))) <= 4

    # DRI/RSTn: restart-marker streams decode identically to plain
    g = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    plain = jpeg_decode(jpeg_encode(g))[0]
    for ri in (1, 2, 5):
        rst = jpeg_decode(jpeg_encode(g, restart_interval=ri))[0]
        assert np.array_equal(plain, rst)


def test_jpeg_decoder_pinned_against_hand_assembled_spec_stream():
    """Decoder pin INDEPENDENT of jpeg_encode: the bitstream below is
    assembled by hand from the T.81 marker/Huffman rules (canonical
    code assignment, EXTEND, 16-bit DQT), the way the GIF decoder is
    pinned on the public 'What's In A GIF' bytes. One 8x8 gray block,
    DC category 6 with raw bits 101001 (EXTEND -> +41), quant DC 8,
    so every pixel = 41*8/8 + 128 = 169."""
    import struct

    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import jpeg_decode

    out = bytearray(b"\xff\xd8")
    # DQT, Pq=1 (16-bit entries — covers the wide-table path): all 8
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + b"\x10"
    out += struct.pack(">64H", *([8] * 64))
    # SOF0: 8-bit, 8x8, 1 component, 1x1 sampling, qtable 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += bytes([1, 0x11, 0])
    # DHT DC0: one code of length 1 -> symbol 6 (category 6)
    out += b"\xff\xc4" + struct.pack(">H", 20)
    out += b"\x00" + bytes([1] + [0] * 15) + bytes([6])
    # DHT AC0: one code of length 1 -> symbol 0x00 (EOB)
    out += b"\xff\xc4" + struct.pack(">H", 20)
    out += b"\x10" + bytes([1] + [0] * 15) + bytes([0])
    # SOS, then entropy bits: DC code '0', bits 101001, EOB '0',
    # 1-padded to a byte -> 0101 0010 = 0x52 ... wait: pad bits are 1s
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
    out += b"\x00\x3f\x00"
    out += bytes([0b01010010])
    out += b"\xff\xd9"
    rgb, nc = jpeg_decode(bytes(out))
    assert nc == 1 and rgb.shape == (8, 8, 3)
    assert np.array_equal(rgb[:, :, 0], np.full((8, 8), 169, np.uint8))


def test_jpeg_features_null_on_corrupt_and_progressive(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        jpeg_decode_features,
        jpeg_encode,
    )

    good = jpeg_encode(np.full((8, 8), 42, np.uint8))
    progressive = bytearray(good)
    sof = progressive.find(b"\xff\xc0")
    progressive[sof + 1] = 0xC2  # masquerade as SOF2 progressive
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(good[:30])),  # truncated
            (3, progressive),
            (4, bytearray(b"not a jpeg at all")),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in jpeg_decode_features(df).collect()}
    assert rows[1]["sum_r"] == 42 * 64 and rows[1]["n_components"] == 1
    for bad in (2, 3, 4):
        assert rows[bad]["width"] is None and rows[bad]["sum_r"] is None


def test_jpeg_dc_thumbnail_is_exact_block_means(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
        jpeg_thumbnail_features,
    )

    # block-constant gray: each thumb pixel IS the planted block value
    px = np.zeros((18, 21), np.uint8)
    exp = np.zeros((3, 3), np.uint8)
    for by in range(3):
        for bx in range(3):
            v = (37 * bx + 59 * by + 5) % 256
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
            exp[by, bx] = v
    thumb, nc = jpeg_decode(jpeg_encode(px, restart_interval=2),
                            dc_only=True)
    assert nc == 1 and thumb.shape == (3, 3, 3)
    assert np.array_equal(thumb[:, :, 0], exp)

    # non-constant blocks: thumb pixel = round(block DC * Q / 8) + 128,
    # i.e. the quantized block mean — compare against direct means
    rng = np.random.RandomState(5)
    px2 = rng.randint(0, 256, (16, 24)).astype(np.uint8)
    thumb2 = jpeg_decode(jpeg_encode(px2), dc_only=True)[0][:, :, 0]
    for by in range(2):
        for bx in range(3):
            blk = px2[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            s = blk.astype(float) - 128.0
            dc = np.floor(np.abs(s.sum() / 8.0) + 0.5) * np.sign(
                s.sum()
            )  # encoder's quantized DC (Q=1)
            want = min(255, max(0, round(dc / 8.0) + 128))
            assert abs(int(thumb2[by, bx]) - want) <= 1

    # the DataFrame op: NULL row for a corrupt payload, real features
    good = jpeg_encode(px)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:25]))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in jpeg_thumbnail_features(df).collect()}
    assert rows[1]["thumb_w"] == 3 and rows[1]["thumb_h"] == 3
    assert rows[1]["sum_r"] == int(exp.sum())
    assert rows[1]["px00_r"] == int(exp[0, 0])
    assert rows[2]["thumb_w"] is None and rows[2]["sum_r"] is None


def test_jpeg_decoder_is_hang_and_alloc_safe():
    import struct

    import numpy as np
    import pytest

    from vectordb_migrator_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    good = bytearray(jpeg_encode(np.full((8, 8), 9, np.uint8)))

    # zero-length marker segment: must raise, never spin forever
    # (pos += seglen with seglen == 0 would stop advancing)
    zero_seg = bytes(good[:2]) + b"\xff\xdb\x00\x00" + bytes(good[2:])
    with pytest.raises(ValueError, match="segment length"):
        jpeg_decode(zero_seg)

    # crafted SOF declaring 65535x65535: must raise before allocating
    # gigabytes of coefficient storage
    sof = good.find(b"\xff\xc0")
    huge = bytearray(good)
    struct.pack_into(">HH", huge, sof + 5, 65535, 65535)
    with pytest.raises(ValueError, match="max_pixels"):
        jpeg_decode(bytes(huge))

    # byte-flip fuzz: every mutation either decodes or raises promptly
    # — no hangs, no silent misparse of the spec guards
    for i in range(2, len(good), 7):
        mut = bytearray(good)
        mut[i] ^= 0xFF
        try:
            jpeg_decode(bytes(mut))
        except Exception:
            pass


def test_jpeg_progressive_roundtrip_matches_baseline():
    """Progressive (SOF2) streams persist the SAME quantized
    coefficients as baseline streams of the same input, so decode
    must agree bit for bit — across gray/RGB, 4:4:4/4:2:0, custom
    quant tables, restart intervals, dims off the MCU grid, and the
    dc_only thumbnail path."""
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(42)
    for trial in range(24):
        gray = trial % 2 == 0
        sub = "420" if (not gray and trial % 3 == 0) else "444"
        h = int(rng.integers(5, 40))
        w = int(rng.integers(5, 40))
        shape = (h, w) if gray else (h, w, 3)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        qt = None if trial % 2 else (
            np.arange(64).reshape(8, 8) % 13 + 1
        )
        ri = [0, 1, 2, 5][trial % 4]
        base = jpeg_decode(jpeg_encode(px, qtable=qt, subsampling=sub))
        payload = jpeg_encode_progressive(
            px, qtable=qt, subsampling=sub, restart_interval=ri
        )
        prog = jpeg_decode(payload)
        assert base[1] == prog[1], trial
        assert np.array_equal(base[0], prog[0]), trial
        tb = jpeg_decode(
            jpeg_encode(px, qtable=qt, subsampling=sub), dc_only=True
        )
        tp = jpeg_decode(payload, dc_only=True)
        assert np.array_equal(tb[0], tp[0]), trial


def test_jpeg_progressive_decoder_pinned_against_hand_assembled_stream():
    """Progressive decoder pin INDEPENDENT of jpeg_encode_progressive:
    marker segments, Huffman tables, and the per-scan symbol/bit
    sequences below are hand-derived from T.81 G.2 (spectral
    selection + successive approximation), exercising DC first+refine,
    AC first with ZRL and EOBn runs, and AC refinement with
    newly-nonzero placement and correction bits. One component, 8x24
    (3 blocks), unit quant table. Planted zigzag coefficients:
    block0 DC=11 AC1=6 AC3=1 AC19=-2; block1 DC=-6; block2 DC=5
    AC1=3. Expected pixels recomputed with the spec IDCT formula."""
    import struct

    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        _ZIGZAG,
        jpeg_decode,
    )

    def pack(bitseq):
        """(value, nbits) tuples -> stuffed entropy bytes, 1-padded."""
        acc, n, out = 0, 0, bytearray()
        for v, ln in bitseq:
            acc = (acc << ln) | (v & ((1 << ln) - 1))
            n += ln
        pad = (8 - n % 8) % 8
        acc = (acc << pad) | ((1 << pad) - 1)
        n += pad
        for i in range(n // 8 - 1, -1, -1):
            byte = (acc >> (8 * i)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    # SOF2: 8-bit, h=8, w=24, 1 component, 1x1 sampling
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 24, 1)
    out += bytes([1, 0x11, 0])
    # DHT DC0: two codes of length 2 -> symbols 3, 4 (codes 00, 01)
    out += b"\xff\xc4" + struct.pack(">H", 21)
    out += b"\x00" + bytes([0, 2] + [0] * 14) + bytes([3, 4])
    # DHT AC0: six codes of length 3 -> 0x00,0x01,0x02,0x10,0x11,0xF0
    # (codes 000..101 in canonical order)
    out += b"\xff\xc4" + struct.pack(">H", 25)
    out += b"\x10" + bytes([0, 0, 6] + [0] * 13)
    out += bytes([0x00, 0x01, 0x02, 0x10, 0x11, 0xF0])
    EOB, S1, S2, EOB2, R1S1, ZRL = (
        (0b000, 3), (0b001, 3), (0b010, 3), (0b011, 3), (0b100, 3),
        (0b101, 3),
    )
    DC3, DC4 = (0b00, 2), (0b01, 2)

    def sos(ss, se, ahal, body):
        return (
            b"\xff\xda" + struct.pack(">HB", 8, 1)
            + bytes([1, 0x00, ss, se, ahal]) + body
        )

    # scan 1 — DC first, Al=1: shifted DCs 5,-3,2 -> diffs 5,-8,5
    out += sos(0, 0, 0x01, pack([
        DC3, (0b101, 3),           # +5
        DC4, (0b0111, 4),          # -8 (raw = -8 + 15)
        DC3, (0b101, 3),           # +5
    ]))
    # scan 2 — AC first 1..63, Al=1: block0 k1=+3(=6>>1), 17 zeros,
    # k19=-1(=|-2|>>1); EOB run of 2 (block0 tail + block1); block2
    # k1=+1(=3>>1) then EOB run of 1
    out += sos(1, 63, 0x01, pack([
        S2, (0b11, 2),             # k1: (0,2) +3
        ZRL,                       # 16 zeros
        R1S1, (0b0, 1),            # run 1, size 1 -> -1 at k19
        EOB2, (0b0, 1),            # EOBn r=1, extra 0 -> run of 2
        S1, (0b1, 1),              # block2 k1: (0,1) +1
        EOB,                       # EOB run of 1
    ]))
    # scan 3 — AC refine 1..63, Ah=1, Al=0: block0 newly-nonzero at
    # k3 (run of 1 zero-history) with correction bit for k1 (6&1=0);
    # k19 bit 0 trails into the EOB run; block1 empty; block2 k1
    # correction bit 1 (3&1); EOBn run of 3 with extra bit 1, then
    # the two buffered correction bits 0 (k19), 1 (block2 k1)
    out += sos(1, 63, 0x10, pack([
        R1S1, (0b1, 1),            # (1<<4)|1, sign +
        (0b0, 1),                  # correction bit for k1
        EOB2, (0b1, 1),            # EOBn r=1, extra 1 -> run of 3
        (0b0, 1), (0b1, 1),        # buffered bits: k19, block2 k1
    ]))
    # scan 4 — DC refine, Ah=1, Al=0: bits 11&1, -6&1, 5&1 = 1,0,1
    out += sos(0, 0, 0x10, pack([(0b1, 1), (0b0, 1), (0b1, 1)]))
    out += b"\xff\xd9"

    rgb, nc = jpeg_decode(bytes(out))
    assert nc == 1 and rgb.shape == (8, 24, 3)

    # expected: spec IDCT (T.81 A.3.3) of the planted coefficients
    planted = [
        {0: 11, 1: 6, 3: 1, 19: -2},
        {0: -6},
        {0: 5, 1: 3},
    ]
    for b_i, coefs in enumerate(planted):
        S = np.zeros((8, 8))
        for zk, v in coefs.items():
            nat = _ZIGZAG[zk]
            S[nat // 8, nat % 8] = v
        px = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                acc = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        acc += (
                            cu * cv * S[v, u]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                px[y, x] = acc / 4.0
        want = np.clip(
            np.sign(px) * np.floor(np.abs(px) + 0.5) + 128, 0, 255
        ).astype(np.uint8)
        got = rgb[:, b_i * 8 : b_i * 8 + 8, 0]
        assert np.array_equal(got, want), b_i


def test_jpeg_progressive_hostile_payloads():
    """The hostile-payload contract extends to SOF2: byte-flip fuzz
    and byte-boundary truncation decode or raise ValueError (never
    hang, never another exception type), and a crafted stream that
    repeats cheap refinement scans hits the scan-count bound."""
    import numpy as np
    import pytest

    from vectordb_migrator_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    px = (np.arange(24 * 16 * 3, dtype=np.uint8).reshape(24, 16, 3)) % 256
    good = jpeg_encode_progressive(px, restart_interval=2)
    for i in range(2, len(good), 5):
        mut = bytearray(good)
        mut[i] ^= 0xFF
        try:
            jpeg_decode(bytes(mut))
        except ValueError:
            pass
    for cut in range(0, len(good), 3):
        try:
            jpeg_decode(good[:cut])
        except ValueError:
            pass
    # scan bomb: replay the final (1-bit-per-block DC refine) scan
    # 150 times — must hit the scan-count cap, not grind through
    small = jpeg_encode_progressive(np.full((8, 8), 77, np.uint8))
    last_sos = small.rfind(b"\xff\xda")
    eoi = small.rfind(b"\xff\xd9")
    bomb = small[:eoi] + small[last_sos:eoi] * 150 + b"\xff\xd9"
    with pytest.raises(ValueError, match="too many progressive scans"):
        jpeg_decode(bomb)


def test_jpeg_exif_parse_and_hostile_payloads(spark):
    """EXIF tier: builder->parser round trip in both TIFF byte
    orders, inline vs offset ASCII values, decode still works with
    APP1/APP2 spliced in, and hostile shapes (truncation at every
    byte, an IFD entry-count bomb, an out-of-range value offset)
    degrade to NULL fields — never an exception."""
    import struct

    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        exif_app1_segment,
        icc_app2_segment,
        jpeg_decode,
        jpeg_encode,
        jpeg_exif_features,
        jpeg_exif_meta,
    )

    base = jpeg_encode(np.full((16, 8), 50, np.uint8))
    for bo in ("II", "MM"):
        app1 = exif_app1_segment(
            orientation=6, datetime="2020:03:05 12:07:00",
            make="cam-3", byte_order=bo,
        )
        jb = base[:2] + app1 + icc_app2_segment() + base[2:]
        m = jpeg_exif_meta(jb)
        assert m["byte_order"] == bo and m["orientation"] == 6
        assert m["exif_datetime"] == "2020:03:05 12:07:00"
        assert m["make"] == "cam-3" and m["icc_present"] is True
        assert (m["width"], m["height"]) == (8, 16)
        assert m["progressive"] is False
        rgb, _ = jpeg_decode(jb)  # decoder skips APPn unharmed
        assert rgb[0, 0, 0] == 50

    # inline (<= 4 byte) ASCII value
    short = base[:2] + exif_app1_segment(make="ab", byte_order="MM") + base[2:]
    assert jpeg_exif_meta(short)["make"] == "ab"
    # r11 ADVICE: a short DateTime (<= 4 bytes w/ NUL) must also take
    # the TIFF-mandated inline branch — it parsed back as garbage when
    # stored via an offset pointer
    for bo in ("II", "MM"):
        for dt in ("abc", "x", ""):
            jb_s = (
                base[:2]
                + exif_app1_segment(datetime=dt, make="maker9", byte_order=bo)
                + base[2:]
            )
            m_s = jpeg_exif_meta(jb_s)
            assert m_s["exif_datetime"] == dt, (bo, dt)
            assert m_s["make"] == "maker9"
    # non-JPEG and Exif-less payloads
    assert jpeg_exif_meta(b"junk")["has_exif"] is None
    assert jpeg_exif_meta(base)["has_exif"] is False

    # truncation at every byte: never raises
    app1 = exif_app1_segment(
        orientation=3, datetime="2020:01:01 00:00:00", make="x" * 40
    )
    jb = base[:2] + app1 + base[2:]
    for cut in range(len(jb)):
        jpeg_exif_meta(jb[:cut])

    # IFD entry-count bomb: declared 0xFFFF entries, 2 bytes of data
    bomb_tiff = b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", 0xFFFF)
    bomb = (
        base[:2]
        + b"\xff\xe1"
        + struct.pack(">H", 2 + 6 + len(bomb_tiff))
        + b"Exif\x00\x00" + bomb_tiff
        + base[2:]
    )
    m = jpeg_exif_meta(bomb)
    assert m["has_exif"] is True and m["orientation"] is None

    # out-of-range ASCII value offset: field skipped, no exception
    evil = bytearray(exif_app1_segment(datetime="2020:01:01 00:00:00"))
    # the DateTime value offset lives in the last entry's value slot;
    # overwrite it with a huge offset
    evil[-21:-17] = struct.pack("<I", 10_000_000)
    m = jpeg_exif_meta(base[:2] + bytes(evil) + base[2:])
    assert m["has_exif"] is True

    # DataFrame shape: the operator is the batch twin of the parser
    df = spark.createDataFrame(
        [(1, bytearray(jb)), (2, bytearray(b"nope"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in jpeg_exif_features(df).collect()}
    assert rows[1]["orientation"] == 3 and rows[2]["width"] is None


def test_jpeg_truncated_segments_raise_valueerror_only():
    # r10 ADVICE: streams cut mid-DQT/DHT/SOF used to escape as raw
    # IndexError/struct.error; the contract is ValueError for EVERY
    # corrupt payload. Truncate a real stream at every byte boundary:
    # each prefix must either decode or raise exactly ValueError.
    import numpy as np
    import pytest

    from vectordb_migrator_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    good = jpeg_encode(
        np.arange(16 * 16, dtype=np.uint8).reshape(16, 16),
        restart_interval=1,
    )
    for cut in range(len(good)):
        try:
            jpeg_decode(good[:cut])
        except ValueError:
            pass  # the documented contract
        # any other exception type propagates and fails the test

    # and specifically: a DQT whose declared length covers only half
    # the table (the exact ADVICE repro shape)
    dqt = good.find(b"\xff\xdb")
    half_table = good[: dqt + 2 + 2 + 20]  # marker+len+20 of 65 bytes
    with pytest.raises(ValueError):
        jpeg_decode(half_table)


def test_rolling_hash31_matches_scalar_loop():
    # the vectorized checksum must be bit-identical to the per-byte
    # Horner loop it replaced (r10 ADVICE perf fix)
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        _HASH_MOD,
        _rolling_hash31,
    )

    rng = np.random.default_rng(7)
    for n in (0, 1, 31, 255, 4096, 70_000, 131_073):
        data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        h = 0
        for b in data:
            h = (h * 31 + b) % _HASH_MOD
        assert _rolling_hash31(data) == h, n


def test_decoders_are_decompression_bomb_safe(spark):
    import struct
    import zlib

    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        gif_decode_features,
        png_decode_features,
        zip_members_features,
    )

    # PNG bomb: tiny IDAT inflating to ~2 GB of declared 25k x 25k
    # gray scanlines (dims bound + capped inflate -> NULL, fast)
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    w = h = 25_000
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" * 1000)  # claims far more than it has
    bomb_png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )

    # GIF bomb: header declares 20k x 20k; the capped LZW decode must
    # raise as soon as output passes w*h, not expand the whole stream
    gif_bomb = (
        b"GIF87a" + struct.pack("<HH", 20_000, 20_000)
        + bytes([0x80, 0, 0]) + bytes(6)  # 2-color palette
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 20_000, 20_000) + b"\x00"
        + bytes([2])  # min code size
        + bytes([1, 0x44]) + b"\x00\x3b"  # a tiny (bogus) data block
    )

    # ZIP bomb: member declares usize far above the deflate truth,
    # plus one declaring less than the stream holds — both must fail
    # the size check with a CAPPED inflate, never balloon
    payload = zlib.compressobj(9, zlib.DEFLATED, -15)
    deflated = payload.compress(b"A" * 100_000) + payload.flush()

    def zip_with_usize(usize):
        crc = zlib.crc32(b"A" * 100_000) & 0xFFFFFFFF
        name = b"a.bin"
        lfh = (
            b"PK\x03\x04" + struct.pack(
                "<HHHHHIIIHH", 20, 0, 8, 0, 0, crc, len(deflated),
                usize, len(name), 0,
            ) + name + deflated
        )
        cd = (
            b"PK\x01\x02" + struct.pack(
                "<HHHHHHIIIHHHHHII", 20, 20, 0, 8, 0, 0, crc,
                len(deflated), usize, len(name), 0, 0, 0, 0, 0, 0,
            ) + name
        )
        eocd = b"PK\x05\x06" + struct.pack(
            "<HHHHIIH", 0, 0, 1, 1, len(cd), len(lfh), 0
        )
        return lfh + cd + eocd

    df = spark.createDataFrame(
        [
            (1, bytearray(bomb_png)),
            (2, bytearray(gif_bomb)),
        ],
        "doc_id long, payload binary",
    )
    png_rows = {r["doc_id"]: r for r in png_decode_features(df).collect()}
    assert png_rows[1]["width"] is None  # bomb -> NULL, promptly
    gif_rows = {r["doc_id"]: r for r in gif_decode_features(df).collect()}
    assert gif_rows[2]["width"] is None

    zdf = spark.createDataFrame(
        [
            (1, bytearray(zip_with_usize(10))),       # claims too little
            (2, bytearray(zip_with_usize(100_000))),  # honest
        ],
        "shard_id long, payload binary",
    )
    zrows = {r["shard_id"]: r for r in zip_members_features(zdf).collect()}
    assert zrows[2]["size"] == 100_000  # honest member still reads
    assert zrows[2]["crc_ok"] is True
    # the lying member must not verify: the capped inflate stops at
    # usize+1, the size check fails, crc_ok is False — never a silent
    # pass and never a ballooned allocation
    assert zrows[1]["crc_ok"] is False


def test_jpeg_420_mcu_constant_exact_and_loss_profile():
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    def rh(a):
        return np.sign(a) * np.floor(np.abs(a) + 0.5)

    def cl(a):
        return np.minimum(np.maximum(a, 0), 255)

    # MCU-constant color, dims off the 16-grid: the full 4:2:0 chain
    # (subsample of four equal chroma samples = identity) is exact
    h, w = 30, 37
    px = np.zeros((h, w, 3), np.uint8)
    for my in range(2):
        for mx in range(3):
            for c in range(3):
                px[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16, c] = (
                    37 * mx + 59 * my + 11 * c + 5
                ) % 256
    rgb, nc = jpeg_decode(jpeg_encode(px, subsampling="420"))
    assert nc == 3 and rgb.shape == (h, w, 3)
    for my in range(2):
        for mx in range(3):
            r0, g0, b0 = (
                float((37 * mx + 59 * my + 11 * c + 5) % 256)
                for c in range(3)
            )
            y = cl(rh(0.299 * r0 + 0.587 * g0 + 0.114 * b0))
            cb = cl(rh(128 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0))
            cr = cl(rh(128 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0))
            exp = (
                cl(rh(y + 1.402 * (cr - 128))),
                cl(rh(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))),
                cl(rh(y + 1.772 * (cb - 128))),
            )
            reg = rgb[
                my * 16 : min(h, my * 16 + 16),
                mx * 16 : min(w, mx * 16 + 16),
            ].astype(float)
            for c in range(3):
                assert np.all(reg[:, :, c] == exp[c])

    # loss profile: smooth content barely loses; alternating extreme
    # chroma loses a lot — exactly what 2x2 chroma averaging means
    yy, xx = np.mgrid[0:24, 0:32]
    smooth = np.stack(
        [(xx * 3) % 256, (yy * 2 + xx) % 256, (yy * 4) % 256], axis=-1
    ).astype(np.uint8)
    got = jpeg_decode(jpeg_encode(smooth, subsampling="420"))[0]
    assert int(np.max(np.abs(got.astype(int) - smooth.astype(int)))) <= 6
    checker = np.zeros((16, 16, 3), np.uint8)
    checker[::2, :, 0] = 255
    checker[1::2, :, 2] = 255
    got2 = jpeg_decode(jpeg_encode(checker, subsampling="420"))[0]
    assert int(np.max(np.abs(got2.astype(int) - checker.astype(int)))) > 50

    # guards: 4:2:0 needs RGB; unknown subsampling rejected
    import pytest

    with pytest.raises(ValueError, match="RGB"):
        jpeg_encode(np.zeros((8, 8), np.uint8), subsampling="420")
    with pytest.raises(ValueError, match="subsampling"):
        jpeg_encode(np.zeros((8, 8, 3), np.uint8), subsampling="422")


def test_oriented_thumbnail_semantics(spark):
    """apply_exif_orientation must implement the TIFF semantics: dims
    swap exactly for orientations 5-8, sums are invariant, and the
    corner that lands at [0,0] follows the 8-case mapping; the
    DataFrame operator composes EXIF parse + DC decode + transform."""
    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        apply_exif_orientation,
        exif_app1_segment,
        jpeg_encode,
        jpeg_oriented_thumbnail_features,
    )

    x = np.arange(12, dtype=np.uint8).reshape(3, 4)[..., None]
    corners = {1: 0, 2: 3, 3: 11, 4: 8, 5: 0, 6: 8, 7: 11, 8: 3}
    for o, want in corners.items():
        y = apply_exif_orientation(x, o)
        assert int(y[0, 0, 0]) == want, o
        assert y.sum() == x.sum()
        assert y.shape[:2] == ((4, 3) if o >= 5 else (3, 4)), o
    # None / out-of-range -> identity
    assert apply_exif_orientation(x, None).shape[:2] == (3, 4)
    assert apply_exif_orientation(x, 9)[0, 0, 0] == 0

    # operator: 16x24 block-constant image rotated 90 CW (o=6)
    px = np.zeros((16, 24), np.uint8)
    for by in range(2):
        for bx in range(3):
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 10 * bx + by
    jb = jpeg_encode(px)
    jb6 = jb[:2] + exif_app1_segment(orientation=6) + jb[2:]
    df = spark.createDataFrame(
        [(1, bytearray(jb6)), (2, bytearray(jb)), (3, bytearray(b"x"))],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in jpeg_oriented_thumbnail_features(df).collect()
    }
    # o=6: thumb 3x2 -> 2x3 wait: thumb grid th=2, tw=3; rotated CW ->
    # (tw, th) = (2, 3); px00 = original bottom-left block = by=1,bx=0
    assert rows[1]["orientation"] == 6
    assert (rows[1]["thumb_w"], rows[1]["thumb_h"]) == (2, 3)
    assert rows[1]["px00_r"] == 1  # block (bx=0, by=1) = 10*0+1
    assert rows[1]["sum_r"] == sum(
        10 * bx + by for by in range(2) for bx in range(3)
    )
    assert rows[2]["orientation"] is None  # no Exif -> identity
    assert (rows[2]["thumb_w"], rows[2]["thumb_h"]) == (3, 2)
    assert rows[2]["px00_r"] == 0
    assert rows[3]["thumb_w"] is None  # junk -> NULL row


def test_exif_gps_ifd1_roundtrip_and_hostile_offsets():
    """r12: GPS sub-IFD + IFD1 thumbnail pointers — builder/parser
    round trip in both byte orders, and every hostile shape (rational
    offset past the buffer, zero denominator, thumbnail span past the
    segment, truncation at every byte) degrades to NULL fields, never
    an exception or an out-of-bounds read."""
    import struct

    import numpy as np

    from vectordb_migrator_spark.operators.multimodal import (
        exif_app1_segment,
        jpeg_encode,
        jpeg_exif_meta,
    )

    jb = jpeg_encode(np.full((8, 8), 9, np.uint8))

    def build(**kw):
        return jb[:2] + exif_app1_segment(**kw) + jb[2:]

    for bo in ("II", "MM"):
        p = build(
            orientation=6, make="cam-1", datetime="2021:01:02 03:04:05",
            byte_order=bo,
            gps_lat=("N", 37, 46, 3012, 100),
            gps_lon=("W", 122, 25, 991, 100),
            thumbnail=b"\xff\xd8ok\xff\xd9",
        )
        m = jpeg_exif_meta(p)
        assert m["gps_lat"] == round(37 + 46 / 60 + 30.12 / 3600, 6)
        assert m["gps_lon"] == round(-(122 + 25 / 60 + 9.91 / 3600), 6)
        assert m["thumb_length"] == 6
        toff = m["thumb_offset"]
        # the advertised span really is the thumbnail bytes
        t = p[p.index(b"Exif\x00\x00") + 6:]
        assert t[toff: toff + 6] == b"\xff\xd8ok\xff\xd9"

    # southern/eastern refs flip signs independently
    m = jpeg_exif_meta(build(
        gps_lat=("S", 1, 30, 0, 1), gps_lon=("E", 2, 0, 3600, 100)
    ))
    assert m["gps_lat"] == -1.5 and m["gps_lon"] == 2.01

    # zero denominator -> NULL coordinate, the other survives
    m = jpeg_exif_meta(build(
        gps_lat=("N", 1, 2, 3, 0), gps_lon=("E", 2, 0, 0, 1)
    ))
    assert m["gps_lat"] is None and m["gps_lon"] == 2.0

    # hostile RATIONAL offset: point GPSLatitude's value slab past the
    # buffer -> NULL, no crash
    good = build(gps_lat=("N", 1, 2, 3, 1), gps_lon=("E", 4, 5, 6, 1))
    ex = good.index(b"Exif\x00\x00") + 6
    t0 = good.index(b"\x02\x00\x05\x00\x03\x00\x00\x00", ex)
    bad = bytearray(good)
    bad[t0 + 8: t0 + 12] = struct.pack("<I", 2 ** 24)
    m = jpeg_exif_meta(bytes(bad))
    assert m["gps_lat"] is None and m["gps_lon"] is not None

    # hostile thumbnail length: span past the segment -> both NULL
    withthumb = build(thumbnail=b"\xff\xd8zz\xff\xd9")
    t1 = withthumb.index(b"\x02\x02\x04\x00\x01\x00\x00\x00")
    bad2 = bytearray(withthumb)
    bad2[t1 + 8: t1 + 12] = struct.pack("<I", 2 ** 24)
    m = jpeg_exif_meta(bytes(bad2))
    assert m["thumb_offset"] is None and m["thumb_length"] is None

    # truncation at every byte: never raises
    full = build(
        orientation=3, make="cam-2", datetime="2021:01:02 03:04:05",
        gps_lat=("N", 10, 20, 30, 1), gps_lon=("W", 40, 50, 60, 1),
        thumbnail=b"\xff\xd8\xff\xd9",
    )
    for cut in range(len(full)):
        jpeg_exif_meta(full[:cut])


def test_fused_fixture_features_matches_two_kernel_path(spark):
    """The r13 fused fixture path (payload build + decode in ONE
    mapInPandas) must produce exactly the rows of the two-kernel
    shape it replaced (gen -> payload binary -> *_decode_features)."""
    import pandas as pd

    from vectordb_migrator_spark.operators.multimodal import (
        BMP_SCHEMA,
        bmp_decode_features,
        bmp_feature_row,
        fused_fixture_features,
    )
    from vectordb_migrator_spark.suite.s06_multimodal import (
        bmp_gradient_payload,
    )

    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))

    def gen(batches):
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

    two_kernel = bmp_decode_features(
        docs.mapInPandas(gen, schema="doc_id long, payload binary")
    )
    fused = fused_fixture_features(
        docs, bmp_gradient_payload, bmp_feature_row, BMP_SCHEMA
    )
    assert fused.schema == two_kernel.schema
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, two_kernel.collect()))
    assert a == b
