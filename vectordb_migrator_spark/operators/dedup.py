"""Deduplication operators (X1/X2) — exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Scale design notes (the point of each implementation choice):

- **Exact dedup** is a map-side-combinable groupBy on a content hash —
  one shuffle of (hash, id) pairs, never of payloads. At 100 TB the
  shuffle carries 24 bytes/row, not documents.
- **MinHash-LSH** shuffles only (band_key, doc_id): signatures are
  computed scan-side in codegen (nested higher-order functions over the
  shingle array — no Python), then candidate generation is a self-join
  on band buckets. Bucket sizes are bounded by banding; skewed buckets
  are handled by AQE skew-join splitting.
- **SimHash** is one 64-dim bit-vote aggregate per doc, then banding on
  16-bit chunks — same shuffle shape as MinHash.
- **Verification** (exact Jaccard / cosine) runs only on candidate
  pairs, which LSH keeps ~linear in corpus size rather than quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_migrator_spark.functions.text import md5_fingerprint
from vectordb_migrator_spark.functions.vector import cosine_similarity, l2_normalize


# ---------------------------------------------------------------- exact

def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Keep the smallest id per duplicate group; report group size.

    groupBy on the key (hash-partial-agg both sides of the shuffle).
    Returns (keep_id, n_dups) — deterministic, unlike dropDuplicates
    whose survivor is partition-order-dependent.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .select("keep_id", "n_dups")
    )


def exact_text_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup via md5 fingerprint — the hash, not the
    document, goes through the shuffle."""
    return exact_dedup(
        df.select(F.col(id_col), md5_fingerprint(text_col).alias("fp")),
        ["fp"],
        id_col,
    )


# ------------------------------------------------------------- shingles

def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (distinct) of a lowercased text column —
    pure codegen: split → slide → array_distinct."""
    col = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(k >= 1, F.array_distinct(grams)).otherwise(
        F.array(F.array_join(toks, " "))
    )


# ------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    explode(shingles) → self-join on shingle → count common per pair →
    ``|A∩B| / (|A| + |B| - |A∩B|)``. The shingle join IS the blocking:
    pairs sharing nothing never meet, so the pair space stays sparse.
    At 100 TB add a document-frequency cap on shingles (drop shingles
    appearing in >X% of docs) to bound the hottest join keys — the
    ``max_df`` parameter below.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles(text_col, n).alias("sh"),
    ).withColumn("sh_n", F.size("sh"))
    exploded = sh.select("id", "sh_n", F.explode("sh").alias("g"))
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("sh_n").alias("n_a"), "g"
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("sh_n").alias("n_b"), "g"
    )
    pairs = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return pairs


# ---------------------------------------------------------- MinHash-LSH

def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature as an array<long>: ``sig[i] = min over
    shingles of xxhash64(shingle ++ '#' ++ i)``. Nested ``transform``
    over a literal seed sequence — fully codegen, no UDF, and
    deterministic across runs/engines (xxhash64 with Spark's fixed
    seed)."""
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.transform(
        seeds,
        lambda i: F.array_min(
            F.transform(
                shingle_col,
                lambda s: F.xxhash64(F.concat(s, F.lit("#"), i.cast("string"))),
            )
        ),
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    rows-per-band r = num_hashes/bands → the usual S-curve with
    threshold ≈ (1/bands)^(1/r). Candidates sharing ≥1 band bucket are
    verified with exact shingle Jaccard, so output has no false
    positives; recall is tunable via (bands, num_hashes).
    """
    r = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    )
    sig = sh.withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * r + 1, r),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bk"),
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))

    left = banded.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "band", "bucket"
    )
    right = banded.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "band", "bucket"
    )
    cands = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = cands.withColumn(
        "jaccard",
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
    ).filter(F.col("jaccard") >= jaccard_threshold)
    return verified.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# -------------------------------------------------------------- SimHash

def simhash64(col: Column | str) -> Column:
    """64-bit SimHash of whitespace tokens, pure codegen.

    Per token: 64-bit xxhash64. Per bit position b: vote +1 if bit set
    else -1, summed over tokens; fingerprint bit b = sign of the vote.
    Expressed as one fold over the token array producing a 64-long
    vote vector, then recombined — no explode, no UDF.
    """
    col = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.split(F.lower(F.trim(col)), r"\s+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # bit positions unrolled in Python (shiftright/shiftleft take literal
    # shift amounts) — 64 folds over the token-hash array, all codegen.
    # closure factory, NOT a default arg — pyspark derives the lambda
    # arity from its parameter list, so a `b=b` default would be bound
    # to a lambda variable.
    def _voter(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    sig = F.lit(0).cast("long")
    for b in range(64):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _voter(b))
        sig = sig.bitwiseOR(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def simhash_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup: band the 64-bit fingerprint into 4×16-bit
    chunks; by pigeonhole, any pair within Hamming distance ≤ 3×? must
    share a chunk (guaranteed complete for distance ≤ 3 with 4 bands;
    wider distances are best-effort recall, standard practice). Shared
    chunk → candidate → exact popcount verify."""
    sigs = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sig"))
    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk"))
    left = chunks.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "chunk")
    right = chunks.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "chunk")
    cands = (
        left.join(right, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------- embedding near-dup

def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column.

    With ``block_col`` (e.g. an LSH bucket or cluster/label column) the
    self-join is per-block — the 100 TB path; the all-pairs fallback is
    for small corpora / verification only. Vectors are pre-normalized
    once so the pair test is a dot product.
    """
    normed = df.select(
        F.col(id_col).alias("id"),
        l2_normalize(vec_col).alias("v"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    )
    a = normed.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"),
        *([F.col("blk")] if block_col else []),
    )
    b = normed.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"),
        *([F.col("blk")] if block_col else []),
    )
    joined = a.join(b, ["blk"]) if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_similarity("v_a", "v_b"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
