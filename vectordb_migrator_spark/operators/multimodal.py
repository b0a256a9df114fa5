"""Multimodal columns (X6) — binary payloads with typed metadata.

Images/audio/video ride through the pipeline as opaque ``binary``
columns plus a metadata struct (modality, mime, width/height/duration).
The Spark-side plumbing — schema, Arrow batch shape, partition sizing —
is real and tested; the actual media decode is STUBBED (no
image/audio libraries in this container): ``decode_image`` raises
``NotImplementedError`` unless given the deterministic fake decoder,
which is what tests and oracles exercise.

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


def decode_image(payload: bytes):  # pragma: no cover - real decoder absent
    """STUB — real image decode requires PIL/opencv, not present in
    this container. The Spark plumbing calls a decoder with this
    signature; swap in a real one in production."""
    raise NotImplementedError(
        "image decoding requires an image library (PIL/opencv); "
        "use fake_decoder for tests"
    )


def fake_decoder(payload: bytes) -> dict:
    """Deterministic fake decode: rolling checksum + a 4-dim 'feature'
    derived from byte statistics. Stands in for decode→resize→embed so
    the distributed plumbing is testable and oracle-checkable."""
    checksum = 0
    for b in payload:
        checksum = (checksum * 31 + b) % _HASH_MOD
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
    column holds raw bytes; output conforms to FEATURE_SCHEMA. With no
    decoder supplied the stub raises — making the missing-library
    dependency explicit rather than silently wrong.
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
