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

from vectordb_migrator_spark.functions.text import md5_fingerprint, ws_strip
from vectordb_migrator_spark.functions.vector import cosine_similarity, l2_normalize
from vectordb_migrator_spark.operators.util import fan_out


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
    pure codegen: split, then a chain of ``zip_with`` against
    progressively-shifted views of the token array (gram i = tok[i] ++
    tok[i+1] ++ … ++ tok[i+n-1]), then array_distinct.

    The zip chain is ~2× faster than per-index ``slice`` +
    ``array_join`` (no per-gram sub-array allocation) and compiles a
    much smaller tree. Null guard: a position where shift j is
    exhausted is null for every shift > j too, so guarding on the
    newest operand alone is sufficient.
    """
    col = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(ws_strip(col)), r"\s+")
    k = F.size(toks) - (n - 1)
    grams = toks
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, i + 1, F.size(toks)),
            lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
        )
    grams = F.filter(grams, lambda x: x.isNotNull())
    return F.when(k >= 1, F.array_distinct(grams)).otherwise(
        F.array(F.array_join(toks, " "))
    )


def _minhash_md5_sig_frame(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    shingle_n: int,
    num_hashes: int,
) -> DataFrame:
    """(id, sig array<long>) md5 MinHash signatures via explode +
    per-hash ``min`` aggregation (r12 opt, guide §4.1): every
    md5/conv runs ONCE per (shingle, i) in whole-stage CODEGEN,
    replacing the interpreted array fold — which, worse, was inlined
    (and therefore re-evaluated) once per band key by every consumer
    that sliced the signature. Values are identical: ``min`` over the
    same per-shingle hashes equals the fold's running ``least``, and
    the fold's 2³³ start value can never survive (an 8-hex-digit hash
    is < 2³²). A document's shingles never span partitions (they come
    from one exploded row), so the partial min folds map-side and the
    exchange carries one (id, partials) row per document.

    Contract: ``id_col`` must be UNIQUE per row (r12 ADVICE note). The
    groupBy keys the signature on id, so duplicate ids would merge
    into one signature over the union of their shingles; every caller
    in this engine feeds a primary-key id, same as the LSH banding
    downstream (which already assumed distinct ids for pair
    generation)."""
    toks = F.split(F.lower(ws_strip(F.col(text_col))), r"\s+")
    exploded = (
        fan_out(df)
        .filter(F.size(toks) >= shingle_n)
        .select(
            F.col(id_col).alias("id"),
            F.explode(shingles(text_col, shingle_n)).alias("t"),
        )
    )

    def h(i: int):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), F.col("t"))), 1, 8
            ),
            16,
            10,
        ).cast("long")

    agg = exploded.groupBy("id").agg(
        *[F.min(h(i)).alias(f"__h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "id",
        F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_md5_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sig array<long>) — the md5 MinHash signatures themselves,
    for estimator diagnostics (match-fraction Jaccard estimates) and
    signature stores; :func:`minhash_md5_pairs` is the banded
    candidate generator over the same expression. Documents with
    fewer than ``shingle_n`` tokens are excluded."""
    return _minhash_md5_sig_frame(
        df,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
    )


def minhash_md5_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash + banded LSH candidate pairs with md5-derived hash
    functions — the CROSS-ENGINE-REPRODUCIBLE twin of
    :func:`minhash_near_dup_pairs`. The production variant seeds
    xxhash64 (faster, JVM-only), so its results can only be checked
    rows-only; md5 + base-16 conv are bit-identical in Spark and
    DuckDB, so this variant's full candidate-pair set carries a
    value-hash oracle. Same S-curve math, same banding, same
    ``max_bucket`` min-id star-cap; ~2-3× more hash cost per shingle
    (md5 vs xxhash64) — use it when verifiability matters more than
    the last constant factor.

    Signatures build in ONE aggregate pass referencing the shingle
    array once (each shingle hashed ``num_hashes`` times, the array's
    tokenize/shingle tree compiled once — see the Catalyst lambda-
    inlining note on ``functions.text.feature_hash_vector``). Only
    (band_key, id) pairs cross the shuffle. Documents with fewer than
    ``shingle_n`` tokens are excluded (they have no full shingle).
    """
    from pyspark.sql import Window as W

    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands

    sig = F.col("sig")
    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.concat_ws(
            "_",
            j.cast("string"),
            F.array_join(
                F.transform(
                    F.slice(sig, j * r + 1, r), lambda x: x.cast("string")
                ),
                "_",
            ),
        ),
    )
    # band keys slice a MATERIALIZED signature column (r12 opt): the
    # former plan inlined the whole signature fold into each band's
    # lambda, recomputing every md5 once per band
    banded = _minhash_md5_sig_frame(
        df,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
    ).select("id", F.explode(band_keys).alias("key"))
    if max_bucket is not None:
        w = W.partitionBy("key")
        marked = banded.withColumn("n_bkt", F.count("*").over(w)).withColumn(
            "anchor", F.min("id").over(w)
        )
        a = marked.select("key", F.col("id").alias("id_a"), "n_bkt", "anchor")
        b = banded.select("key", F.col("id").alias("id_b"))
        pairs = (
            a.join(b, "key")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(
                (F.col("n_bkt") <= max_bucket)
                | (F.col("id_a") == F.col("anchor"))
            )
        )
    else:
        a = banded.select("key", F.col("id").alias("id_a"))
        b = banded.select("key", F.col("id").alias("id_b"))
        pairs = a.join(b, "key").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b").distinct()


def simhash_md5_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs with md5-derived token hashes — the
    cross-engine-reproducible twin of :func:`simhash_near_dup_pairs`
    (whose xxhash64 votes are JVM-only, hence rows-only checkable).
    The 64 bit-votes come from two md5-derived 32-bit halves per
    token; the fingerprint is kept as two BIGINT halves (``sig_hi``,
    ``sig_lo``) so no signed-64 overflow semantics differ between
    engines. Banding on the four 16-bit chunks generates candidates;
    the exact Hamming verify (``bit_count(xor)`` on both halves)
    removes false positives, so extra candidates cost time, never
    correctness. ``max_bucket`` star-caps oversized band buckets.

    ONE aggregate pass references the token-hash array once (the
    Catalyst lambda-inlining trap — see ``feature_hash_vector``);
    only (band_key, id, sig) rows cross the shuffle.

    Contract: ``id_col`` must be UNIQUE per row (r12 ADVICE note) —
    the bit-vote groupBy keys on id, so duplicate ids would merge
    into one fingerprint over the union of their tokens. All callers
    feed a primary-key id, as the pair banding already required.
    """
    from pyspark.sql import Window as W

    # Bit votes via explode + 64 codegen sum aggregates (r12 opt,
    # guide §4.1): one md5 per DISTINCT token in whole-stage codegen,
    # replacing the interpreted token fold — which, worse, was inlined
    # (and so re-evaluated, md5s included) once per signature half.
    # Values are identical: votes_i = Σ_tokens ±1 is an order-free
    # integer sum, and the >0 bit test matches the fold's. A
    # document's tokens never span partitions (one exploded row), so
    # partials fold map-side and the exchange carries one row per doc.
    # Null-text docs drop out of the explode instead of carrying NULL
    # sigs; their pairs were always removed by the NULL-hamming filter,
    # so the output is unchanged.
    import functools

    toks = F.array_distinct(F.split(F.lower(ws_strip(F.col(text_col))), r"\s+"))
    exploded = fan_out(df).select(
        F.col(id_col).alias("id"), F.explode(toks).alias("t")
    )
    h1 = F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(F.col("t")), 9, 8), 16, 10).cast("long")

    def vote(i: int) -> Column:
        src = h1 if i >= 32 else h2
        mask = F.lit(1 << (i % 32)).cast("long")
        return F.sum(
            F.when(src.bitwiseAND(mask) != 0, 1).otherwise(-1)
        ).alias(f"__v{i}")

    agg = exploded.groupBy("id").agg(*[vote(i) for i in range(64)])

    def half(lo_bit: int) -> Column:
        return functools.reduce(
            lambda a, b: a.bitwiseOR(b),
            [
                F.when(
                    F.col(f"__v{lo_bit + i}") > 0, F.lit(1 << i).cast("long")
                ).otherwise(F.lit(0).cast("long"))
                for i in range(32)
            ],
        )

    sigs = agg.select(
        "id",
        half(0).alias("sig_lo"),
        half(32).alias("sig_hi"),
    )
    band = F.explode(
        F.array(
            *[
                F.concat_ws(
                    "_",
                    F.lit(str(j)),
                    F.shiftright(F.col(col), s).bitwiseAND(F.lit(65535)).cast(
                        "string"
                    ),
                )
                for j, (col, s) in enumerate(
                    [("sig_lo", 0), ("sig_lo", 16), ("sig_hi", 0), ("sig_hi", 16)]
                )
            ]
        )
    )
    banded = sigs.select("id", "sig_lo", "sig_hi", band.alias("key"))
    a = banded.select(
        "key",
        F.col("id").alias("id_a"),
        F.col("sig_lo").alias("lo_a"),
        F.col("sig_hi").alias("hi_a"),
    )
    b = banded.select(
        "key",
        F.col("id").alias("id_b"),
        F.col("sig_lo").alias("lo_b"),
        F.col("sig_hi").alias("hi_b"),
    )
    if max_bucket is not None:
        w = W.partitionBy("key")
        a = (
            banded.withColumn("n_bkt", F.count("*").over(w))
            .withColumn("anchor", F.min("id").over(w))
            .select(
                "key",
                F.col("id").alias("id_a"),
                F.col("sig_lo").alias("lo_a"),
                F.col("sig_hi").alias("hi_a"),
                "n_bkt",
                "anchor",
            )
        )
    pairs = a.join(b, "key").filter(F.col("id_a") < F.col("id_b"))
    if max_bucket is not None:
        pairs = pairs.filter(
            (F.col("n_bkt") <= max_bucket) | (F.col("id_a") == F.col("anchor"))
        )
    ham = F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    ) + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    return (
        pairs.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


# ------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
    score: str = "jaccard",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle
    (``score="containment"`` switches to Broder containment of the
    smaller set — see :func:`ngram_containment_pairs`).

    explode(shingles) → self-join on shingle → count common per pair →
    ``|A∩B| / (|A| + |B| - |A∩B|)``. The shingle join IS the blocking:
    pairs sharing nothing never meet, so the pair space stays sparse.

    ``max_df`` is the 100 TB knob: drop shingles whose document
    frequency exceeds it BEFORE bucketing. A stopword-like shingle
    shared by N docs otherwise produces one N-element bucket and O(N²)
    pairs in a single task — the classic skewed-key scale-killer. The
    df pre-pass is a map-side-combinable count (the hot gram costs one
    long counter per map task, never a giant list), and the surviving
    grams reach the bucket stage via a semi-join that reuses the gram
    partitioning. Semantics with the cap: ``common`` counts only
    surviving shingles while ``|A|``/``|B|`` stay full-size, so scores
    of pairs that shared a dropped gram are strict underestimates —
    the standard trade (hot grams carry no dedup signal). With
    ``max_df`` ≥ the corpus df-max, results are exactly unchanged
    (property-tested).
    """
    sh = fan_out(df).select(
        F.col(id_col).alias("id"),
        shingles(text_col, n).alias("sh"),
    ).withColumn("sh_n", F.size("sh"))
    # Raw shingle strings are collapsed to a 128-bit key (two seeded
    # xxhash64 BIGINTs) scan-side, BEFORE any exchange: gram shuffles
    # carry 16 bytes per occurrence instead of the n-token string
    # (~5-10× fewer shuffle bytes at word shingles). 128-bit collision
    # probability is negligible at any corpus size, and the key never
    # appears in the output — semantics are unchanged.
    exploded = sh.select(
        "id",
        "sh_n",
        F.explode("sh").alias("g"),
    ).select(
        "id",
        "sh_n",
        F.xxhash64("g").alias("gh1"),
        F.xxhash64(F.lit(1), F.col("g")).alias("gh2"),
    )
    if max_df is not None:
        keep = (
            exploded.groupBy("gh1", "gh2")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("gh1", "gh2")
        )
        exploded = exploded.join(keep, ["gh1", "gh2"], "left_semi")
    # ONE shuffle (groupBy gram key), then pair generation inside each
    # gram bucket via a nested-transform cross of the collected
    # (id, n) structs — replaces the exploded self-join (which would
    # shuffle both sides and sort-merge). Bucket size is bounded by
    # gram document-frequency (≤ max_df when set).
    buckets = exploded.groupBy("gh1", "gh2").agg(
        F.collect_list(F.struct("id", "sh_n")).alias("docs")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda a: F.filter(
                F.transform(
                    F.col("docs"),
                    lambda b: F.when(
                        a.getField("id") < b.getField("id"),
                        F.struct(
                            a.getField("id").alias("id_a"),
                            b.getField("id").alias("id_b"),
                            a.getField("sh_n").alias("n_a"),
                            b.getField("sh_n").alias("n_b"),
                        ),
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    counted = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", "p.n_a", "p.n_b")
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("common"))
    )
    if score == "containment":
        # Broder containment of the SMALLER shingle set in the pair:
        # catches a short doc embedded in a long one, where Jaccard
        # dilutes toward 0 as the size ratio grows
        val = F.col("common").cast("double") / F.least(
            F.col("n_a"), F.col("n_b")
        ).cast("double")
        out_col = "containment"
    else:
        val = F.col("common").cast("double") / (
            F.col("n_a") + F.col("n_b") - F.col("common")
        ).cast("double")
        out_col = "jaccard"
    return (
        counted.withColumn(out_col, val)
        .filter(F.col(out_col) >= threshold)
        .select("id_a", "id_b", F.round(out_col, 6).alias(out_col))
    )


def ngram_containment_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Broder CONTAINMENT pairs: ``|A∩B| / min(|A|,|B|)`` over n-gram
    shingles — the asymmetric companion to resemblance/Jaccard. A
    200-token quote embedded in a 10k-token article has Jaccard ≈ 0.02
    (invisible to any resemblance threshold) but containment ≈ 1.0;
    this is the detector for quotes, syndication, and doc-in-doc
    duplication. Same single-shuffle bucket machinery and ``max_df``
    hot-gram guard as :func:`ngram_jaccard_pairs`."""
    return ngram_jaccard_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        n=n,
        threshold=threshold,
        max_df=max_df,
        score="containment",
    )


# ---------------------------------------------------------- MinHash-LSH

import numpy as np

# Fixed permutation constants for the 2-universal family
# ``h -> (a*h + b) mod p`` with Mersenne prime p = 2^31 - 1. A plain
# multiply-add WITHOUT the modulus is order-preserving (strictly
# increasing in h), so min() would pick the same element under every
# "permutation" — the modulus is what actually scrambles the order
# (the affine image wraps ~a times across the domain). Ranges keep
# every intermediate below 2^63 for ANSI arithmetic: h < p < 2^31 and
# a < p give a*h + b < 2^62 + 2^31. Seeded → deterministic runs.
_MERSENNE_P = (1 << 31) - 1
_MASK32 = (1 << 32) - 1
_rng = np.random.default_rng(1234567)
_MINHASH_A = [int(a) for a in _rng.integers(1, _MERSENNE_P, size=256)]
_MINHASH_B = [int(b) for b in _rng.integers(0, _MERSENNE_P, size=256)]


def minhash_hash(col: Column) -> Column:
    """Base hash of one shingle into [0, p): xxhash64 → low 32 bits →
    mod p. Computed once per shingle, shared by all permutations."""
    return F.pmod(F.xxhash64(col).bitwiseAND(F.lit(_MASK32)), F.lit(_MERSENNE_P))


def minhash_signature(hash_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature as array<long> over a *pre-hashed* shingle
    array (``hash_col = transform(shingles, minhash_hash)``, values in
    [0, p)): ``sig[i] = min over h of ((h * A_i + B_i) mod p)``.

    Each shingle is hashed ONCE; the per-permutation work is a long
    multiply-add-mod, far cheaper than re-hashing the shingle string
    per permutation. The A/B constants are TWO array literals indexed
    by the permutation number (not 64 unrolled struct literals — the
    smaller expression tree cuts codegen/compile time ~30% and the
    results are bit-identical).
    """
    a_lit = F.lit(_MINHASH_A[:num_hashes])
    b_lit = F.lit(_MINHASH_B[:num_hashes])
    return F.transform(
        F.sequence(F.lit(1), F.lit(num_hashes)),
        lambda i: F.array_min(
            F.transform(
                hash_col,
                lambda h: F.pmod(
                    h * F.element_at(a_lit, i) + F.element_at(b_lit, i),
                    F.lit(_MERSENNE_P),
                ),
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
    bands: int = 32,
    jaccard_threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    rows-per-band r = num_hashes/bands → the usual S-curve with
    threshold ≈ (1/bands)^(1/r). Default (64, 32) → r=2: a j=0.5 pair
    collides with p = 1-(1-0.25)^32 ≈ 0.9999, so recall on clear dups
    is near-certain; the shallower S-curve admits more low-j candidates
    but the exact-Jaccard verify step removes every false positive, so
    extra candidates cost verify time, never correctness. Raise r for
    a sharper curve when the corpus is huge and the threshold high.

    ``max_bucket`` bounds the per-bucket pair blow-up: a cluster of N
    exact duplicates shares EVERY band, so each of its buckets holds N
    ids and all-pairs generation emits O(N²) rows per band — at 100 TB
    a 1M-copy boilerplate doc would mean 10¹² candidate rows. When a
    bucket exceeds the cap, pair generation switches to a STAR around
    the bucket's min id (N-1 pairs): connectivity within the bucket is
    preserved — downstream connected-components clustering groups the
    same docs — at O(N) cost. Buckets at or under the cap are
    unaffected (property-tested), and running :func:`exact_text_dedup`
    first remains the recommended pipeline for heavily-duplicated
    corpora.
    """
    r = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    )
    # hash each shingle once, then exchange: fan_out parallelizes the
    # signature compute AND the shuffle boundary stops projection
    # collapse from inlining (= re-evaluating) the base-hash array into
    # each of the 64 permutation folds.
    hashed = fan_out(
        sh.withColumn("hv", F.transform(F.col("sh"), minhash_hash))
    )
    sig = hashed.withColumn("sig", minhash_signature(F.col("hv"), num_hashes))
    # band keys only — the shingle arrays do NOT ride through the
    # banding shuffle; candidates are (id, id) pairs and the arrays are
    # joined back just for the verify step. At 100 TB this is the
    # difference between shuffling ids and shuffling documents.
    # single explode expression (NOT 16 unrolled refs of `sig`:
    # projection collapse would inline the 64-hash signature once per
    # band — measured 8× slower).
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    b,
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * r + 1, r),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    ),
                ),
            )
        ).alias("bucket"),
    )
    buckets = banded.groupBy("bucket").agg(F.collect_list("id").alias("ids"))
    # the cap shrinks the OUTER side of the pair cross to just the
    # min-id anchor for oversized buckets — star pairs fall out of the
    # same single expression tree (anchor < b covers every other id),
    # so the capped plan compiles no more code than the uncapped one
    if max_bucket is not None:
        outer_src = F.when(
            F.size(F.col("ids")) > max_bucket,
            F.array(F.array_min(F.col("ids"))),
        ).otherwise(F.col("ids"))
    else:
        outer_src = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            outer_src,
            lambda a: F.filter(
                F.transform(
                    F.col("ids"),
                    lambda b: F.when(
                        a < b, F.struct(a.alias("id_a"), b.alias("id_b"))
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    cands = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return verified.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# -------------------------------------------------------------- SimHash

# one literal long per bit; bit 63 is the sign bit, representable only
# as the negative two's-complement value
_POW2 = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash of whitespace tokens, pure codegen.

    Per token: 64-bit xxhash64. Per bit position b: vote +1 if bit set
    else -1, summed over tokens; fingerprint bit b = sign of the vote.

    ONE fold over the token-hash array with an array<long> accumulator
    (``zip_with`` against a bit-mask literal array), then one fold to
    recombine sign bits — measured 8× faster than 64 separate
    per-bit folds (the unrolled version re-walks the token array per
    bit and its expression tree dominates compile time). Bit tests use
    ``h & mask != 0`` — correct for negative hashes where a division
    trick would not be.
    """
    col = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.split(F.lower(ws_strip(col)), r"\s+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    p2 = F.lit(_POW2)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            p2,
            lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            p2,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s.bitwiseOR(x),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup: band the 64-bit fingerprint into 4×16-bit
    chunks; by pigeonhole, any pair within Hamming distance ≤ 3×? must
    share a chunk (guaranteed complete for distance ≤ 3 with 4 bands;
    wider distances are best-effort recall, standard practice). Shared
    chunk → candidate → exact popcount verify.

    ``max_bucket``: a (band, chunk) key shared by N docs makes the
    candidate self-join emit O(N²) rows — exact-duplicate clusters
    share all four chunks. When a bucket exceeds the cap, its rows
    instead pair against the bucket's min-id anchor only (O(N), window
    over the same (band, chunk) partitioning — no extra join), which
    preserves in-bucket connectivity for downstream clustering.
    Buckets at or under the cap use the full self-join unchanged."""
    sigs = fan_out(df).select(F.col(id_col).alias("id"), simhash64(text_col).alias("sig"))
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
    if max_bucket is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy("band", "chunk")
        chunks = (
            chunks.withColumn("n_bkt", F.count("*").over(w))
            .withColumn("anchor", F.min(F.struct("id", "sig")).over(w))
        )
        small = chunks.filter(F.col("n_bkt") <= max_bucket)
        left = small.select(
            F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "chunk"
        )
        right = small.select(
            F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "chunk"
        )
        full = left.join(right, ["band", "chunk"]).filter(
            F.col("id_a") < F.col("id_b")
        )
        star = (
            chunks.filter(
                (F.col("n_bkt") > max_bucket) & (F.col("anchor.id") < F.col("id"))
            )
            .select(
                F.col("anchor.id").alias("id_a"),
                F.col("anchor.sig").alias("sig_a"),
                F.col("id").alias("id_b"),
                F.col("sig").alias("sig_b"),
            )
        )
        cands = (
            full.select("id_a", "sig_a", "id_b", "sig_b")
            .unionAll(star)
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        left = chunks.select(
            F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "chunk"
        )
        right = chunks.select(
            F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "chunk"
        )
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
    max_bucket: int | None = None,
    allow_all_pairs: bool = False,
    kernel_block_cap: int = 65536,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column.

    With ``block_col`` (e.g. an LSH bucket or cluster/label column) the
    self-join is per-block — the 100 TB path; the all-pairs fallback is
    for small corpora / verification only and must be opted into
    explicitly: ``block_col=None`` raises unless
    ``allow_all_pairs=True``, because an unblocked crossJoin is O(N²)
    and would silently melt down at any real corpus size (scale
    callers always pass blocking — labels, LSH buckets, SemDeDup
    clusters). Vectors are pre-normalized once so the pair test is a
    dot product.

    ``max_bucket`` bounds the per-block pair blow-up exactly like the
    MinHash/SimHash caps: a degenerate corpus (many near-zero or
    same-direction vectors) can land N rows in ONE block, making the
    self-join O(N²) in a single task. Blocks over the cap switch to a
    STAR around the block's min-id row (N-1 pairs, O(N)): in-block
    connectivity is preserved for downstream connected-components
    clustering, and blocks at or under the cap are byte-identical to
    the uncapped plan (property-tested). The cap is a window over the
    existing block partitioning — no extra shuffle.

    ``kernel_block_cap`` bounds the uncapped blocked Arrow path (r11
    ADVICE): the kernel materializes a whole block in one Python
    worker (n×d vectors plus a 2048×n float64 pair slab), so one
    skewed block could OOM where the distributed self-join merely
    slowed down. Blocks over the cap route through the self-join plan
    instead — bit-identical arithmetic (A/B-asserted), so the split
    is invisible in the output.

    Rows whose vector contains a non-finite value (NaN/±Inf) or a
    NULL element are excluded up front (r11 ADVICE): Spark's join
    comparison treats NaN as greater than every double (NaN >= t is
    TRUE) while the NumPy kernel's ``cos >= t`` is False — filtering
    both paths keeps them bit-identical, and a NaN "similarity" is
    meaningless anyway.
    """
    if block_col is None and not allow_all_pairs:
        raise ValueError(
            "embedding_near_dup_pairs without block_col is an O(N²) "
            "all-pairs crossJoin — pass a blocking column (label, LSH "
            "bucket, SemDeDup cluster) or opt in explicitly with "
            "allow_all_pairs=True for small-corpus verification."
        )
    finite = F.forall(
        F.col(vec_col).cast("array<double>"),
        lambda x: (~F.isnan(x)) & (F.abs(x) != F.lit(float("inf"))),
    )
    df = df.filter(F.coalesce(finite, F.lit(False)))
    normed = df.select(
        F.col(id_col).alias("id"),
        l2_normalize(vec_col).alias("v"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    )
    if block_col and max_bucket is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy("blk")
        marked = normed.withColumn("n_bkt", F.count("*").over(w)).withColumn(
            "anchor", F.min(F.struct("id", "v")).over(w)
        )
        small = marked.filter(F.col("n_bkt") <= max_bucket)
        full = (
            small.select(
                F.col("id").alias("id_a"), F.col("v").alias("v_a"), "blk"
            )
            .join(
                small.select(
                    F.col("id").alias("id_b"), F.col("v").alias("v_b"), "blk"
                ),
                ["blk"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
        )
        star = marked.filter(
            (F.col("n_bkt") > max_bucket) & (F.col("anchor.id") < F.col("id"))
        ).select(
            F.col("anchor.id").alias("id_a"),
            F.col("anchor.v").alias("v_a"),
            F.col("id").alias("id_b"),
            F.col("v").alias("v_b"),
        )
        joined = full.select("id_a", "v_a", "id_b", "v_b").unionAll(star)
        return (
            joined.withColumn("cos", cosine_similarity("v_a", "v_b"))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        )
    if block_col:
        # Arrow fast path for the uncapped blocked case (r10 verdict
        # ask #8): the self-join + interpreted higher-order cosine
        # (4 array folds per pair) dominated the bench row; one
        # applyInPandas kernel per block computes the SAME IEEE
        # arithmetic vectorized — per-dimension accumulation loops
        # preserve the zip_with/aggregate left-fold ADDITION ORDER, so
        # every cos double is BIT-IDENTICAL to the join plan
        # (A/B-asserted in tests), while the block's pair matrix is
        # one BLAS-shaped NumPy pass instead of 200k lambda evals.
        # Row-chunking bounds the matrix at CH×n doubles; the capped
        # (max_bucket) star path above handles genuinely skewed
        # blocks, exactly as before. Rounding stays Spark-side.
        def kernel(pdf):
            import numpy as np
            import pandas as pd

            empty = pd.DataFrame(
                {
                    "id_a": pd.array([], dtype="int64"),
                    "id_b": pd.array([], dtype="int64"),
                    "cos": pd.array([], dtype="float64"),
                }
            )
            n = len(pdf)
            if n < 2:
                return empty
            pdf = pdf.sort_values("id", kind="mergesort")
            ids = pdf["id"].to_numpy()
            v = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            d = v.shape[1]
            # l2_norm of the (already normalized) vectors, preserving
            # the fold's addition order: ((0 + x0²) + x1²) + ...
            nn = np.zeros(n)
            for i in range(d):
                nn = nn + v[:, i] * v[:, i]
            nrm = np.sqrt(nn)
            out = []
            ch = 2048
            for s0 in range(0, n, ch):
                s1 = min(s0 + ch, n)
                num = np.zeros((s1 - s0, n))
                for i in range(d):
                    num = num + v[s0:s1, i][:, None] * v[:, i][None, :]
                den = nrm[s0:s1][:, None] * nrm[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = num / den
                ok = (den != 0.0) & (cos >= threshold)
                rr, cc = np.nonzero(ok)
                keep = ids[cc] > ids[rr + s0]
                rr, cc = rr[keep], cc[keep]
                if len(rr):
                    out.append(
                        pd.DataFrame(
                            {
                                "id_a": ids[rr + s0],
                                "id_b": ids[cc],
                                "cos": cos[rr, cc],
                            }
                        )
                    )
            return pd.concat(out) if out else empty

        # Route only bounded blocks through the kernel (r11 ADVICE):
        # a block past kernel_block_cap falls back to the distributed
        # self-join plan, whose doubles the kernel reproduces
        # bit-for-bit — the union is therefore independent of the cap.
        from pyspark.sql import Window as W

        w = W.partitionBy("blk")
        marked = normed.withColumn("n_bkt", F.count("*").over(w))
        bounded = (
            marked.filter(F.col("n_bkt") <= kernel_block_cap)
            .drop("n_bkt")
            .groupBy("blk")
            .applyInPandas(kernel, "id_a long, id_b long, cos double")
        )
        big = marked.filter(F.col("n_bkt") > kernel_block_cap).drop("n_bkt")
        big_pairs = (
            big.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "blk")
            .join(
                big.select(
                    F.col("id").alias("id_b"), F.col("v").alias("v_b"), "blk"
                ),
                ["blk"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", cosine_similarity("v_a", "v_b"))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos")
        )
        return bounded.unionAll(big_pairs).select(
            "id_a", "id_b", F.round("cos", 6).alias("cos")
        )
    a = normed.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a")
    )
    b = normed.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b")
    )
    joined = a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_similarity("v_a", "v_b"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def lsh_embedding_near_dup_pairs(
    df: DataFrame,
    planes: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding near-dup with hyperplane-LSH blocking — the label-free
    scale path for :func:`embedding_near_dup_pairs`. Rows bucket by
    their sign-bit signature (pure codegen, no shuffle of its own);
    the per-bucket self-join then generates candidate pairs inside
    ~1/2^nbits of the corpus instead of all-pairs. Recall follows the
    standard LSH trade: pairs split across buckets are missed; stack
    more plane sets (union of pair frames) to push recall up.

    ``max_bucket`` caps oversized buckets with the min-id star (see
    :func:`embedding_near_dup_pairs`) — with only 2^nbits buckets, a
    skewed corpus can put O(N) rows in one bucket and the self-join
    goes quadratic; the cap bounds it to O(N) per bucket. Size
    ``nbits ≈ log2(N / target_bucket)`` so typical buckets stay under
    the cap and the star path stays the exception."""
    from vectordb_migrator_spark.operators.similarity import (
        random_hyperplane_signature,
    )

    bucketed = df.withColumn(
        "__bucket", random_hyperplane_signature(F.col(vec_col), planes)
    )
    return embedding_near_dup_pairs(
        bucketed,
        id_col=id_col,
        vec_col=vec_col,
        block_col="__bucket",
        threshold=threshold,
        max_bucket=max_bucket,
    )


def lsh_embedding_near_dup_pairs_multi(
    df: DataFrame,
    plane_sets: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_bucket: int | None = None,
) -> DataFrame:
    """The recall knob for LSH-blocked near-dup, made concrete: run
    :func:`lsh_embedding_near_dup_pairs` once per independent plane
    set and union the pair frames (dropDuplicates on the pair key). A
    pair missed by one bucketing (split across buckets) is found by
    another with independent planes; recall converges to the all-pairs
    result as sets stack, while each set's scan stays 1/2^nbits
    blocked and capped. The union dedup shuffles only (id_a, id_b,
    cos) triples — pairs, never vectors."""
    frames = [
        lsh_embedding_near_dup_pairs(
            df,
            planes,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            max_bucket=max_bucket,
        )
        for planes in plane_sets
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.dropDuplicates(["id_a", "id_b"])


def embedding_cross_near_dup(
    train: DataFrame,
    eval_df: DataFrame,
    planes: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-level benchmark decontamination: every (train, eval)
    pair whose cosine exceeds ``threshold`` — the semantic twin of
    n-gram test-set decontamination (``cleaning.ngram_decontaminate``)
    for when contamination is paraphrased rather than copied.

    Both sides bucket by the SAME hyperplane-LSH signature (pure
    codegen), so candidates form only inside matching buckets — and
    because the eval side is benchmark-sized (thousands of rows, not
    corpus-sized), Spark broadcasts it: the train corpus is ONE scan
    with a map-side hash probe, no shuffle of train vectors, ever.
    There is deliberately no cross-set star-cap: a skewed bucket costs
    |bucket| × |eval ∩ bucket| comparisons, bounded by the broadcast
    side, not quadratic in the corpus.

    Returns ``(train_id, eval_id, cos)``; anti-join ``train`` on
    ``train_id`` to apply the removal.
    """
    from vectordb_migrator_spark.operators.similarity import (
        random_hyperplane_signature,
    )

    def side(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            l2_normalize(vec_col).alias(f"{prefix}_v"),
            random_hyperplane_signature(F.col(vec_col), planes).alias("__bucket"),
        )

    return (
        side(train, "train")
        .join(F.broadcast(side(eval_df, "eval")), "__bucket")
        .withColumn("cos", cosine_similarity("train_v", "eval_v"))
        .filter(F.col("cos") >= threshold)
        .select("train_id", "eval_id", F.round("cos", 6).alias("cos"))
    )


def apply_dedup(
    df: DataFrame,
    clusters: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a dedup decision: keep ONE representative per
    near-dup cluster (the minimum id — exactly the cluster label
    :func:`~vectordb_migrator_spark.operators.graph
    .connected_components` assigns) plus every unclustered document.

    The apply step the detect→cluster pipeline ends with: ``clusters``
    holds only documents that participate in at least one near-dup
    pair, so the join side is duplicate-sized, not corpus-sized — one
    key-partitioned join (AQE broadcasts it when small), a null-or-
    representative filter, and the corpus never moves otherwise."""
    c = clusters.withColumnRenamed("id", id_col)
    return (
        df.join(c, id_col, "left")
        .filter(F.col("comp").isNull() | (F.col(id_col) == F.col("comp")))
        .drop("comp")
    )


def apply_dedup_best(
    df: DataFrame,
    clusters: DataFrame,
    *,
    id_col: str = "doc_id",
    quality_col: str = "quality",
) -> DataFrame:
    """Materialize a dedup decision keeping the HIGHEST-QUALITY member
    of each near-dup cluster (ties break toward the lower id) — the
    production alternative to :func:`apply_dedup`'s min-id rule: when a
    syndicated article appears five times, you keep the cleanest copy,
    not the one that happened to get the smallest id.

    ``quality_col`` must exist on ``df`` (any ordering signal: token
    count, a quality-classifier score, -surprisal). Scale shape: the
    quality column is projected onto the duplicate-sized cluster frame
    (column-pruned id+quality scan), one window over the existing
    ``comp`` partitioning picks the keeper, and the corpus-side work is
    a single duplicate-sized anti-join on ids — the corpus text never
    shuffles."""
    from pyspark.sql import Window

    c = clusters.withColumnRenamed("id", id_col)
    members = c.join(df.select(id_col, quality_col), id_col)
    w = Window.partitionBy("comp").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    losers = (
        members.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_bucket: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then deduplicate *within* clusters only — the
    clustering bounds the quadratic so the near-dup self-join never
    sees the whole corpus, which is what makes semantic dedup feasible
    at 100 TB (the paper runs it on LAION at billions of rows for the
    same reason).

    Assignment is nearest-centroid over plan-time constant centers
    (:func:`~vectordb_migrator_spark.operators.clustering
    .assign_clusters` — pure codegen, no shuffle); candidate pairs
    come from :func:`embedding_near_dup_pairs` blocked on the cluster
    id; the keep rule is: a row is dropped iff some same-cluster row
    with a SMALLER id is cosine-similar above ``threshold``. (Direct
    pairs, not transitive closure — with pairs (A,C) and (B,C) but
    A≁B, both A and B survive where connected components would keep
    only A; for transitive semantics compose the pair frame with
    ``graph.connected_components`` + :func:`apply_dedup` instead.)

    Returns the surviving rows with their ``cluster`` column — one
    blocked self-join and one duplicate-sized anti-join; the corpus
    never shuffles its vectors.
    """
    from vectordb_migrator_spark.operators.clustering import assign_clusters

    assigned = assign_clusters(df, centroids, vec_col=vec_col)
    pairs = embedding_near_dup_pairs(
        assigned,
        id_col=id_col,
        vec_col=vec_col,
        block_col="cluster",
        threshold=threshold,
        max_bucket=max_bucket,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return assigned.join(losers, id_col, "left_anti")


def shingle_table(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """The persistable ``(id, sh, sh_n)`` shingle side-table for a
    document frame — shingle once, store next to the corpus, and every
    later ingest dedups against the STORE instead of re-shingling
    history (see :func:`incremental_dedup`'s ``corpus_pre_shingled``
    and ``streaming.incremental.deduped_ingest``)."""
    return (
        fan_out(df)
        .select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh"))
        .withColumn("sh_n", F.size("sh"))
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
    corpus_pre_shingled: bool = False,
) -> DataFrame:
    """Ingest-time dedup of a NEW batch against an existing corpus —
    the production daily-ingest pattern: the corpus is already deduped
    and never re-examined against itself; only batch-vs-corpus and
    batch-vs-earlier-batch pairs form.

    Rejection rule (deterministic, first-seen wins with id as the
    stand-in for arrival order): a batch document is dropped when its
    n-gram Jaccard reaches ``threshold`` against ANY corpus document
    or ANY batch document with a smaller id. The rule is pairwise —
    a rejected batch doc still rejects its own later near-dups (the
    behavior of signature-store ingest filters, which register a
    document's signature whether or not it survived).

    Returns the surviving batch rows. Ids must be disjoint across the
    two frames.

    Scale design mirrors :func:`ngram_jaccard_pairs`: one gram
    shuffle, in-bucket pair generation with the side/order condition
    applied INSIDE the bucket (corpus-corpus pairs never materialize),
    ``max_df`` capping hot shingles. The corpus side moves only its
    (gram, id) pairs — at 100 TB you persist the corpus shingle table
    once (:func:`shingle_table`) and pass it back with
    ``corpus_pre_shingled=True`` so history is never re-shingled:
    ``corpus`` is then a ``(id, sh, sh_n)`` frame and its text never
    needs to exist at ingest time at all.
    """

    def prep(df: DataFrame, side: str) -> DataFrame:
        return shingle_table(df, id_col=id_col, text_col=text_col, n=n).withColumn(
            "side", F.lit(side)
        )

    corpus_sh = (
        corpus.select("id", "sh", "sh_n").withColumn("side", F.lit("c"))
        if corpus_pre_shingled
        else prep(corpus, "c")
    )
    exploded = (
        prep(batch, "b")
        .unionByName(corpus_sh)
        .select("id", "sh_n", "side", F.explode("sh").alias("g"))
    )
    if max_df is not None:
        keep = (
            exploded.groupBy("g")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("g")
        )
        exploded = exploded.join(keep, "g", "left_semi")
    buckets = exploded.groupBy("g").agg(
        F.collect_list(F.struct("id", "sh_n", "side")).alias("docs")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda a: F.filter(
                F.transform(
                    F.col("docs"),
                    lambda b: F.when(
                        (a.getField("side") == "b")
                        & (
                            (b.getField("side") == "c")
                            | (b.getField("id") < a.getField("id"))
                        ),
                        F.struct(
                            a.getField("id").alias("id_a"),
                            b.getField("id").alias("id_b"),
                            a.getField("sh_n").alias("n_a"),
                            b.getField("sh_n").alias("n_b"),
                        ),
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    flagged = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", "p.n_a", "p.n_b")
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("common"))
        .filter(
            F.col("common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double")
            >= threshold
        )
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return batch.join(flagged, id_col, "left_anti")


def ppjoin_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT Jaccard similarity join with PPJoin-style prefix
    filtering (Xiao et al., WWW'08) — all pairs with shingle Jaccard
    ≥ ``threshold``, no approximation, but without
    :func:`ngram_jaccard_pairs`'s every-shingle blocking: each
    document indexes only its PREFIX — the |d| − ⌈t·|d|⌉ + 1 globally
    RAREST shingles — because two sets meeting the threshold must
    share at least one prefix token (pigeonhole on the ⌈t·|d|⌉
    overlap requirement). At t = 0.5 that halves the posting volume,
    and because prefixes keep the rarest grams first, the hot
    stopword-like shingles that create O(N²) buckets never enter the
    candidate join at all — the skew the full join needs ``max_df``
    to cap simply doesn't arise.

    Plan: one df-count pass (map-combinable) ranks shingles by
    global rarity; prefixes equi-join on the shingle to propose
    candidates (with the PPJoin length filter |small| ≥ t·|large|
    applied on the id-width candidate rows); only verified candidates
    re-join the full shingle arrays for the exact
    ``|A∩B|/(|A|+|B|−|A∩B|)`` — exactness lives in the verify step,
    so the prefix ordering affects cost, never results."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold not in (0, 1]: {threshold}")
    sh = (
        fan_out(df)
        .select(
            F.col(id_col).alias("id"),
            shingles(text_col, n).alias("sh"),
        )
        .withColumn("sh_n", F.size("sh"))
        .filter(F.col("sh_n") > 0)
        # hashed-shingle twin of the string array: a SINGLE 64-bit key
        # per gram is enough everywhere below exactness doesn't live —
        # candidate buckets (collisions only ADD candidates) and the
        # overlap UPPER BOUND prefilter (hash-intersect >= true
        # intersect, so pairs it rejects truly fail) — and long-array
        # kernels stay in codegen's primitive fast path
        .withColumn("shh", F.transform("sh", lambda g: F.xxhash64(g)))
        # five consumers below (posting explode, two prefilter sides,
        # two verify sides): materialize the doc-sized shingle frame
        # once instead of re-shingling the corpus per consumer (the
        # same multi-consumer checkpoint rule as the shared near-dup
        # pair kernel)
        .localCheckpoint(eager=True)
    )
    ex = sh.select("id", "sh_n", F.explode("shh").alias("gh"))
    dfc = ex.groupBy("gh").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("df", "gh")
    prefix_len = (
        F.col("sh_n")
        - F.ceil(F.lit(threshold) * F.col("sh_n")).cast("int")
        + 1
    )
    # the prefix posting index is consumed by BOTH sides of the
    # candidate self-join below — materialize it once (id-width rows,
    # ~half the gram count; exactly the index a PPJoin system persists)
    prefix = (
        ex.join(dfc, ["gh"])
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= prefix_len)
        .select("id", "sh_n", "__r", "gh")
        .localCheckpoint(eager=True)
    )
    # Candidate generation: equi-join of the prefix index with
    # itself on the gram key, with the PPJoin length filter
    # (Jaccard >= t forces t*|large| <= |small|) and the positional
    # filter (overlap past the shared token is bounded by the shorter
    # remaining suffix) applied on the id-width joined rows before the
    # distinct. Measured ~2x faster than generating pairs inside
    # collect_list buckets with nested array lambdas: the hash join
    # and filters run in whole-stage codegen, where 33M candidate
    # evaluations at sf0.1 cost ~7s; the HOF variant leaves codegen
    # for every struct comparison.
    pa = prefix.select(
        F.col("id").alias("id_a"), F.col("sh_n").alias("na"),
        F.col("__r").alias("ra"), "gh",
    )
    pb = prefix.select(
        F.col("id").alias("id_b"), F.col("sh_n").alias("nb"),
        F.col("__r").alias("rb"), "gh",
    )
    cand = (
        pa.join(pb, ["gh"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("na", "nb").cast("double")
                >= F.lit(threshold) * F.greatest("na", "nb")
            )
            & (
                (
                    F.least(
                        F.col("na") - F.col("ra"),
                        F.col("nb") - F.col("rb"),
                    )
                    + 1
                ).cast("double")
                >= F.lit(threshold / (1.0 + threshold))
                * (F.col("na") + F.col("nb"))
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # Overlap-bound prefilter on the HASHED arrays before the exact
    # verify: Jaccard >= t forces |A∩B| >= ceil(t/(1+t)·(|A|+|B|)).
    # Cross-set collisions (a shingle of A\B colliding with one of
    # B\A) inflate the hashed intersect — harmless, the exact verify
    # filters them. The one direction that could in principle reject
    # a qualifying pair is a collision between two DISTINCT shingles
    # both inside A∩B: the deduped hash arrays then count that pair
    # of shingles once, undercounting the true overlap by one. That
    # is a same-64-bit-xxhash event between two specific shingles of
    # one document pair (~2⁻⁶⁴ per pair; zero observed across the
    # corpus in the exactness tests), so the bound is exact-safe up
    # to that astronomically small caveat rather than strictly.
    # Template-
    # heavy corpora make the prefix filter weak (measured 3.5M
    # candidates -> 256 survivors at sf0.1), and long-array
    # array_intersect runs ~5x cheaper per pair than the string one —
    # the exact string verify then touches only the survivors.
    ha = sh.select(
        F.col("id").alias("id_a"), F.col("shh").alias("__ha"),
        F.col("sh_n").alias("na"),
    )
    hb = sh.select(
        F.col("id").alias("id_b"), F.col("shh").alias("__hb"),
        F.col("sh_n").alias("nb"),
    )
    need = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("na") + F.col("nb"))
    )
    pre = (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .filter(F.size(F.array_intersect("__ha", "__hb")) >= need)
        .select("id_a", "id_b")
    )
    sa = sh.select(
        F.col("id").alias("id_a"), F.col("sh").alias("__sa"),
        F.col("sh_n").alias("na"),
    )
    sb = sh.select(
        F.col("id").alias("id_b"), F.col("sh").alias("__sb"),
        F.col("sh_n").alias("nb"),
    )
    common = F.size(F.array_intersect("__sa", "__sb"))
    j = common.cast("double") / (
        F.col("na") + F.col("nb") - common
    ).cast("double")
    return (
        pre.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(j, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


def cdc_chunks(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    avg_tokens: int = 8,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/gear-hash idea lifted
    to word streams): a token is a chunk BOUNDARY iff its md5-derived
    hash ≡ 0 (mod ``avg_tokens``), so boundaries are a function of
    CONTENT ONLY — inserting or deleting a sentence re-chunks just the
    chunk it lands in, while every fixed-width shingle window after
    the edit shifts. Chunk-level exact dedup therefore catches
    insert-shifted near-duplicates that whole-doc fingerprints miss,
    at exact-hash (not similarity-join) cost; expected chunk length is
    ``avg_tokens`` words.

    Scale shape: the whole chunker is ONE linear ``F.aggregate`` fold
    over the token array — a running (done chunks, current chunk)
    struct in pure codegen, no explode, no per-doc window, no shuffle
    of any kind until the caller joins on chunk hashes. md5 + base-16
    conv keeps boundaries bit-identical in Spark and DuckDB (the
    md5-twin convention), so the full chunk table carries a value-hash
    oracle.

    Returns (id, chunk_no, chunk_text, chunk_md5), chunk_no 0-based
    in document order."""
    toks = F.filter(
        F.split(F.lower(ws_strip(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )

    def is_bnd(t: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            % F.lit(avg_tokens)
        ) == 0

    acc0 = F.struct(
        F.array().cast("array<string>").alias("done"),
        F.lit("").alias("cur"),
        F.lit(False).alias("has"),
    )

    def step(acc: Column, t: Column) -> Column:
        new_cur = F.when(
            acc["has"], F.concat(acc["cur"], F.lit(" "), t)
        ).otherwise(t)
        closed = is_bnd(t)
        return F.struct(
            F.when(closed, F.array_append(acc["done"], new_cur))
            .otherwise(acc["done"])
            .alias("done"),
            F.when(closed, F.lit("")).otherwise(new_cur).alias("cur"),
            (~closed).alias("has"),
        )

    def fin(acc: Column) -> Column:
        return F.when(
            acc["has"], F.array_append(acc["done"], acc["cur"])
        ).otherwise(acc["done"])

    out = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.aggregate(toks, acc0, step, fin).alias("__chunks"),
    )
    return out.select(
        "id",
        F.posexplode("__chunks").alias("chunk_no", "chunk_text"),
    ).select(
        "id",
        F.col("chunk_no").cast("long").alias("chunk_no"),
        "chunk_text",
        F.md5("chunk_text").alias("chunk_md5"),
    )


def cdc_pair_candidates(
    chunks: DataFrame,
    *,
    min_shared: int = 2,
    max_bucket: int = 50,
) -> DataFrame:
    """Shift-robust near-dup candidates off a :func:`cdc_chunks`
    table: documents sharing >= ``min_shared`` distinct chunk hashes.
    The equi-join on chunk_md5 is the same blocked-join shape as
    every LSH family — per-hash fan-out is capped by the
    ``max_bucket`` min-id star rule (a boilerplate chunk shared by
    thousands of docs must not go quadratic), and ``min_shared``
    plays the band-count role in the precision dial.

    Returns (id_a, id_b, shared) with id_a < id_b."""
    d = chunks.select("id", "chunk_md5").distinct()
    freq = d.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).alias("__n"), F.min("id").alias("__anchor")
    )
    a = d.withColumnRenamed("id", "id_a")
    b = d.withColumnRenamed("id", "id_b")
    return (
        a.join(b, "chunk_md5")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(freq, "chunk_md5")
        .filter(
            (F.col("__n") <= max_bucket)
            | (F.col("id_a") == F.col("__anchor"))
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def oph_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 16,
    rot_c: int = 1 << 33,
) -> DataFrame:
    """One-Permutation-Hashing MinHash signatures with rotation
    densification (Li, Owen & Zhang 2012; Shrivastava & Li 2014) —
    the production MinHash economy: classic k-hash MinHash evaluates
    k hashes PER SHINGLE (``minhash_md5_signatures``); OPH hashes
    each shingle ONCE, routes it to bin ``h mod k``, and keeps the
    per-bin minimum — k× fewer hash evaluations for the same
    signature width, the difference between 16 passes and 1 over a
    100 TB shingle stream. Short documents leave bins empty; rotation
    densification fills bin b from the nearest non-empty bin to the
    right (cyclic), offset by j·C so borrowed values never collide
    with genuine minima — keeping the matched-bin fraction an
    unbiased Jaccard estimator.

    Pure codegen: one ``aggregate`` fold builds the k-slot array
    scan-side (no shuffle, no per-shingle k-hash fan-out), one
    ``transform`` densifies. Returns (id, sig array<long> with NULLs,
    dense array<long>, empty_share double).
    """
    from vectordb_migrator_spark.functions.text import ws_strip

    def h(t):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit("oph:"), t)), 1, 8), 16, 10
        ).cast("long")

    sh = shingles(text_col, shingle_n)
    empty = F.array_repeat(F.lit(None).cast("long"), k)
    sig = F.aggregate(
        sh,
        empty,
        lambda acc, t: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda m, i: F.when(
                F.pmod(h(t), F.lit(k)) == i.cast("long"),
                F.least(F.coalesce(m, F.lit(1 << 62).cast("long")), h(t)),
            ).otherwise(m),
        ),
    )
    dens = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda b: F.element_at(
            F.filter(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda j: F.when(
                        F.element_at(
                            F.col("sig"), (F.pmod(b + j, F.lit(k)) + 1).cast("int")
                        ).isNotNull(),
                        F.element_at(
                            F.col("sig"), (F.pmod(b + j, F.lit(k)) + 1).cast("int")
                        )
                        + j.cast("long") * F.lit(rot_c).cast("long"),
                    ),
                ),
                lambda x: x.isNotNull(),
            ),
            1,
        ),
    )
    toks = F.split(F.lower(ws_strip(F.col(text_col))), r"\s+")
    return (
        fan_out(df)
        .filter(F.size(toks) >= shingle_n)
        .select(F.col(id_col).alias("id"), sig.alias("sig"))
        .select(
            "id",
            "sig",
            dens.alias("dense"),
            (
                F.size(F.filter(F.col("sig"), lambda v: v.isNull()))
                / F.lit(float(k))
            ).alias("empty_share"),
        )
    )


def decontamination_report(
    df: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Eval-set decontamination scan (round 11) — the GPT-3-style
    n-gram overlap filter every serious training-data pipeline runs
    before training: a candidate document is contaminated when too
    many of its word n-grams appear ANYWHERE in the held-out
    benchmark set, because even partial leakage inflates eval scores.
    Reported per candidate: distinct-shingle count, how many of them
    hit the benchmark's shingle set, the containment ratio, and the
    ``threshold`` flag.

    Shingling is the library convention (:func:`shingles` — distinct
    lowercased word n-grams, whole-text gram for sub-n documents), so
    the scan composes with the MinHash/Jaccard dedup family on the
    same side-tables. Scale shape: benchmarks are tiny next to a
    corpus (MBs vs TBs), so the eval shingle set BROADCASTS and the
    candidate side is one explode → left-semi join → per-doc count —
    the corpus is scanned once and never shuffles its text; at 100 TB
    the eval set rides along as a broadcast exactly like a dim table.
    """
    train = shingle_table(df, id_col=id_col, text_col=text_col, n=n)
    ev = (
        shingle_table(eval_df, id_col=id_col, text_col=text_col, n=n)
        .select(F.explode("sh").alias("gram"))
        .distinct()
    )
    ex = train.select("id", F.explode("sh").alias("gram"))
    hits = (
        ex.join(F.broadcast(ev), "gram", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    out = (
        train.select("id", "sh_n")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("sh_n").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias(
                "n_hit"
            ),
        )
    )
    cont = F.when(
        F.col("n_shingles") > 0,
        F.round(
            F.col("n_hit").cast("double")
            / F.col("n_shingles").cast("double"),
            6,
        ),
    )
    return out.select(
        id_col,
        "n_shingles",
        "n_hit",
        cont.alias("containment"),
        (cont >= F.lit(threshold)).alias("contaminated"),
    ).orderBy(id_col)


def ngram_novelty_report(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty (round 11) — the corpus-redundancy
    / memorization-pressure metric: with documents in id order (the
    stand-in for arrival order), a document's novelty is the fraction
    of its distinct word n-grams that no EARLIER document contains.
    Low-novelty tails are where train-time memorization and wasted
    tokens live; the curve over ingest order is the classic
    "how much new text is this crawl actually adding" diagnostic.

    Implementation is two aggregations over the same shingle
    side-table the dedup family persists: first-occurrence doc per
    gram (min id), then per-doc counts of grams whose first occurrence
    IS the doc. Both are map-side-combinable group-bys on the gram
    hash — the text itself never shuffles. Returns (id, n_shingles,
    n_novel, novelty) per document.
    """
    train = shingle_table(df, id_col=id_col, text_col=text_col, n=n)
    ex = train.select("id", F.explode("sh").alias("gram"))
    first = ex.groupBy("gram").agg(F.min("id").alias("first_id"))
    novel = (
        ex.join(first, "gram")
        .filter(F.col("id") == F.col("first_id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    )
    return (
        train.select("id", "sh_n")
        .join(novel, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("sh_n").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias(
                "n_novel"
            ),
            F.when(
                F.col("sh_n") > 0,
                F.round(
                    F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
                    / F.col("sh_n").cast("double"),
                    6,
                ),
            ).alias("novelty"),
        )
        .orderBy(id_col)
    )


def semantic_dedup_fp(
    df: DataFrame,
    *,
    k_clusters: int = 8,
    n_iter: int = 3,
    threshold: float = 0.6,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ENGINE-EXACT SemDeDup (round 11) — the fixed-point twin of the
    rows-only ``x2_semdedup_fitted``, completing the conversion
    pattern that anchored PQ training and IVF: the cluster centroids
    come from the integer Lloyd fit (:func:`~vectordb_migrator_spark.
    operators.similarity.pq_learned_codebooks_fp` at m=1), assignment
    is exact int64 distance with lowest-index ties, and the SemDeDup
    keep rule — drop a row iff a SAME-CLUSTER row with a smaller id is
    cosine-similar above ``threshold`` — runs on QUANTIZED cosines:
    L2-normalize (the fixed-order IEEE fold both engines replay),
    fix-point at ``scale``, exact int64 dot, integer threshold
    ``round(threshold·scale²)``. Centroids, assignments, every pair
    decision, and the survivor set replay bit-for-bit in SQL.

    Returns the survivors as ``(id_col, cluster)`` ordered by id —
    the float :func:`semantic_dedup` stays as the production-shaped
    operator (arbitrary centroids, max_bucket star cap); this is its
    value-hash anchor. Scale shape: the fit is the PQ operator's;
    the pair test is the same cluster-blocked self-join, bounded by
    cluster sizes (block + cap with the float twin when skew bites).
    """
    from vectordb_migrator_spark.functions.vector import l2_normalize
    from vectordb_migrator_spark.operators.similarity import (
        fixed_point_array,
        pq_learned_codebooks_fp,
    )

    cbs = pq_learned_codebooks_fp(
        df, m=1, k=k_clusters, n_iter=n_iter, scale=scale,
        id_col=id_col, vec_col=vec_col,
    )
    cents = cbs[0]
    t_int = int(round(threshold * scale * scale))
    iv = fixed_point_array(F.col(vec_col), scale)
    cands = F.array(
        *[F.array(*[F.lit(int(x)) for x in cw]) for cw in cents]
    )
    cdists = F.transform(
        cands,
        lambda cw: F.aggregate(
            F.zip_with(F.col("__iv"), cw, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ),
    )
    assign = (F.array_position(cdists, F.array_min(cdists)) - 1).cast(
        "int"
    )
    nint = fixed_point_array(l2_normalize(F.col(vec_col)), scale)
    base = (
        df.select(
            F.col(id_col).alias("__id"),
            iv.alias("__iv"),
            nint.alias("__nv"),
        )
        .select("__id", "__nv", assign.alias("cluster"))
        .localCheckpoint(eager=True)
    )
    a = base.select(
        F.col("__id").alias("__ida"), F.col("__nv").alias("__nva"),
        "cluster",
    )
    b = base.select(
        F.col("__id").alias("__idb"), F.col("__nv").alias("__nvb"),
        "cluster",
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("__nva"), F.col("__nvb"), lambda p, q: p * q
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    losers = (
        a.join(b, ["cluster"])
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(dot >= F.lit(t_int))
        .select(F.col("__idb").alias("__id"))
        .distinct()
    )
    return (
        base.join(losers, "__id", "left_anti")
        .select(F.col("__id").alias(id_col), "cluster")
        .orderBy(id_col)
    )
