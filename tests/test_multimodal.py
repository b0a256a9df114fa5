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
