"""chunk_text / int8 quantization unit tests."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
import pytest
from pyspark.sql import functions as F

from vectordb_migrator_spark.functions.vector import int8_dequantize, int8_quantize
from vectordb_migrator_spark.operators.chunking import chunk_text


def test_chunk_covers_all_tokens_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = chunk_text(df, chunk_size=4, overlap=1).orderBy("chunk_id").collect()
    # step = 3 → starts 0,3,6 and the formula adds the tail window
    chunks = [r["chunk_text"].split(" ") for r in rows]
    assert chunks[0] == ["t0", "t1", "t2", "t3"]
    assert chunks[1] == ["t3", "t4", "t5", "t6"]
    assert chunks[2] == ["t6", "t7", "t8", "t9"]
    # every token covered, consecutive chunks share `overlap` tokens
    assert set().union(*chunks) == {f"t{i}" for i in range(10)}
    for a, b in zip(chunks, chunks[1:]):
        assert a[-1:] == b[:1]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4]


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "only three tokens")], ["doc_id", "text"])
    rows = chunk_text(df, chunk_size=64, overlap=16).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "only three tokens"
    assert rows[0]["n_tokens"] == 3


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_text(df, chunk_size=4, overlap=4)


def test_int8_roundtrip_error_bound(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = df.select(
        "vec_id",
        int8_quantize("embedding").alias("qs"),
        F.col("embedding").alias("v"),
    ).withColumn("back", int8_dequantize("qs")).collect()
    by_id = {r["vec_id"]: r for r in out}
    r1 = by_id[1]
    assert r1["qs"]["scale"] == pytest.approx(1.0 / 127)
    assert max(r1["qs"]["q"]) <= 127 and min(r1["qs"]["q"]) >= -127
    for orig, back in zip(r1["v"], r1["back"]):
        assert abs(orig - back) <= r1["qs"]["scale"] / 2 + 1e-12
    # zero vector: scale 0, all-zero codes, exact roundtrip
    r2 = by_id[2]
    assert r2["qs"]["scale"] == 0.0
    assert r2["qs"]["q"] == [0, 0, 0, 0]
    assert r2["back"] == [0.0, 0.0, 0.0, 0.0]


def test_pack_chunks_offsets_and_bins(spark):
    from vectordb_migrator_spark.operators.chunking import pack_chunks

    df = spark.createDataFrame(
        [("d", 0, 30), ("d", 1, 30), ("d", 2, 30), ("d", 3, 5), ("e", 0, 70)],
        "doc_id string, chunk_id long, n_tokens long",
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["pack_id"], r["pack_offset"])
        for r in pack_chunks(df, budget=64).collect()
    }
    # d: offsets 0,30,60,90 -> bins 0,0,0,1 (chunk at 60 overflows by 26)
    assert rows[("d", 0)] == (0, 0)
    assert rows[("d", 1)] == (0, 30)
    assert rows[("d", 2)] == (0, 60)
    assert rows[("d", 3)] == (1, 90 - 64)
    assert rows[("e", 0)] == (0, 0)


def test_training_pipeline_stage_invariants(spark):
    """The composed pipeline honors each stage's contract: every
    surviving doc meets the quality gate, no two survivors share an
    md5 fingerprint, chunk token counts follow the 32/8 spec, and
    per-pack offsets never exceed the 64-token budget."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from vectordb_migrator_spark.functions.text import (
        md5_fingerprint,
        token_count_ws,
    )
    from vectordb_migrator_spark.suite import QUERIES

    out = QUERIES["x0_training_pipeline"](spark, SF_DIR)
    rows = out.collect()
    assert rows, "pipeline produced no chunks"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    surv_ids = {r["doc_id"] for r in rows}
    surv_docs = docs.filter(F.col("doc_id").isin(list(surv_ids)))
    # quality gate
    assert surv_docs.filter(token_count_ws("text") < 20).count() == 0
    # exact dedup: fingerprints unique among survivors
    n_fp = surv_docs.select(md5_fingerprint("text")).distinct().count()
    assert n_fp == len(surv_ids)
    # chunk spec: all chunks are <= 32 tokens; all non-final chunks == 32
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["chunk_id"])
        assert all(r["n_tokens"] <= 32 for r in doc_rows)
        assert all(r["n_tokens"] == 32 for r in doc_rows[:-1])
        # packing: offset is the running token sum mod 64, bin = div
        o = 0
        for r in doc_rows:
            assert r["pack_id"] == o // 64 and r["pack_offset"] == o % 64
            o += r["n_tokens"]


# ----------------------------------------------------------------- FIM


def test_fim_transform_matches_hashlib_replica(spark):
    import hashlib
    import re

    from vectordb_migrator_spark.operators.chunking import fim_transform

    def h(tag, doc_id):
        return int(
            hashlib.md5(f"{tag}{doc_id}".encode()).hexdigest()[:8], 16
        )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one two three"),
        (3, ""),           # empty doc: n_tok 0, psm is '' or sentinels only
        (4, "lonely"),
        (5, "  spaced   out   tokens  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in fim_transform(df, fim_rate=2).collect()}
    for doc_id, text in rows:
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        n = len(toks)
        apply = h("fim:", doc_id) % 2 == 0
        r = got[doc_id]
        assert r["n_tok"] == n
        assert r["fim"] == int(apply)
        if not apply:
            assert r["u"] is None and r["v"] is None
            assert r["psm"] == " ".join(toks)
            continue
        c1, c2 = h("fimu:", doc_id) % (n + 1), h("fimv:", doc_id) % (n + 1)
        u, v = min(c1, c2), max(c1, c2)
        assert (r["u"], r["v"]) == (u, v)
        want = " ".join(
            ["<PRE>"] + toks[:u] + ["<SUF>"] + toks[v:] + ["<MID>"]
            + toks[u:v]
        )
        assert r["psm"] == want, doc_id
    # determinism across calls
    again = {r["id"]: r["psm"] for r in fim_transform(df).collect()}
    assert again == {k: v["psm"] for k, v in got.items()}


@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("pq r\nz"), max_size=30),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=10, deadline=None)
def test_fim_transform_is_a_permutation(spark, texts):
    """Invariant: a FIM row's PSM stream is the three sentinels plus
    EXACTLY the original token multiset (reordered, never altered);
    a pass-through row is the identity join."""
    import re

    from collections import Counter

    from vectordb_migrator_spark.operators.chunking import fim_transform

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in fim_transform(df, fim_rate=2).collect()}
    for i, t in rows:
        toks = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        r = got[i]
        out = r["psm"].split(" ") if r["psm"] else []
        if r["fim"]:
            assert Counter(out) == Counter(
                toks + ["<PRE>", "<SUF>", "<MID>"]
            )
            # prefix tokens stay contiguous right after <PRE>
            u = r["u"]
            assert out[1 : 1 + u] == toks[:u]
        else:
            assert out == toks or (not toks and out == [""]) or (
                not toks and not out
            )


def test_affine_quantize_roundtrip_and_onesided_advantage(spark):
    import numpy as np

    from vectordb_migrator_spark.functions.vector import (
        affine_dequantize,
        affine_quantize,
        int8_dequantize,
        int8_quantize,
    )

    # one-sided (ReLU-like) vector: affine error ~half of symmetric
    v = [0.0, 0.1, 0.25, 0.5, 0.75, 1.0, 0.33, 0.66]
    rows = [(1, v), (2, [3.0] * 8), (3, [-1.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = df.select(
        "id",
        "v",
        affine_quantize("v").alias("a"),
        int8_quantize("v").alias("s"),
    ).select(
        "id",
        "v",
        F.col("a.zero_point").alias("zp"),
        affine_dequantize("a").alias("da"),
        int8_dequantize("s").alias("ds"),
    )
    got = {r["id"]: r for r in out.collect()}
    r1 = got[1]
    err_a = max(abs(x - y) for x, y in zip(v, r1["da"]))
    err_s = max(abs(x - y) for x, y in zip(v, r1["ds"]))
    assert err_a <= err_s  # affine wins on one-sided data
    assert err_a <= (1.0 - 0.0) / 255.0 / 2 + 1e-12
    assert r1["zp"] == 0  # min is 0 -> zero point at origin
    # constant vector: scale-0 convention, all-zero codes
    r2 = got[2]
    assert all(x == 0.0 for x in r2["da"])
    # symmetric-range vector: zero point centers at 128-ish
    assert abs(got[3]["zp"] - 128) <= 1
