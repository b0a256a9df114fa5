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


def test_stub_decoder_raises(documents):
    feats = extract_features(attach_payload(documents.limit(1)))
    with pytest.raises(PythonException, match="NotImplementedError"):
        feats.collect()


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
