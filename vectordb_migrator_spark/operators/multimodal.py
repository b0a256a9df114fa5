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
    1-in-N selection by id hash (no data movement, pure filter). The
    real per-frame split would be a mapInPandas exploding payload →
    frames; sampling *before* decode is the scale-relevant part."""
    return df.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(every_n)) == 0)
