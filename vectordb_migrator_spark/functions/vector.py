"""Vector math over ``array<float|double>`` columns.

All functions are pure Catalyst expressions built from higher-order
functions (``zip_with`` / ``aggregate``) — they run inside whole-stage
codegen on the JVM with no Python boundary, so they vectorize the same
on local[32] and on a 1000-executor cluster.

The reference has no vector math at all (its vectors are opaque
``list[float]`` payloads, ``core/adapter.py:33-42``); these functions
are the compute core for the distance semantics its backends implement
natively (Qdrant ``distance ∈ {Cosine, Euclid, Dot}``,
``adapters/qdrant.py:163-169``; Pinecone ``metric``,
``examples/pgvector_to_pinecone_config.json:23-25``) and for the
similarity-search / near-dup extension operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product of two array columns (double precision).

    Left-fold in element order → deterministic across engines, which is
    what lets the DuckDB oracle reproduce it bit-for-bit after rounding.
    """
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diff = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x - y)
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den != 0.0, num / den)


def l2_normalize(a: Column | str) -> Column:
    """Scale a vector to unit L2 norm (zero vectors pass through).

    Pre-normalizing once before a top-k similarity scan turns cosine
    into a plain dot product — at 100 TB this halves the per-pair work
    and lets the probe-side norm be computed once.
    """
    a = _as_double(a)
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )
    )
    return F.when(norm == 0.0, a).otherwise(
        F.transform(a, lambda x: x / norm)
    )


def matryoshka_truncate(a: Column | str, dim: int) -> Column:
    """Truncate an MRL-trained embedding to its first ``dim``
    coordinates and re-normalize to unit L2 — the standard
    matryoshka-representation trick: a dim/D-sized vector whose cosine
    ranking approximates the full-width one, so coarse retrieval scans
    read a fraction of the bytes and the full vector only reranks the
    shortlist. Pure codegen (slice + one norm fold); at 100 TB you
    materialize the truncated column next to (or instead of) the full
    one, exactly like PQ codes."""
    return l2_normalize(F.slice(_as_double(a), 1, dim))


def int8_quantize(a: Column | str) -> Column:
    """Symmetric int8 scalar quantization: ``scale = max|v| / 127``,
    ``q_i = round(v_i / scale)`` ∈ [-127, 127]. Returns
    ``struct(scale double, q array<int>)``.

    The storage play for 100 TB embedding corpora: 4 bytes/dim → 1,
    and int8 dot products are the standard ANN re-rank currency. Zero
    vectors quantize to scale 0 with all-zero codes.
    """
    a = _as_double(a)
    mx = F.aggregate(
        a, F.lit(0.0), lambda s, x: F.greatest(s, F.abs(x))
    )
    scale = mx / F.lit(127.0)
    q = F.when(mx == 0.0, F.transform(a, lambda x: F.lit(0))).otherwise(
        F.transform(a, lambda x: F.round(x / scale, 0).cast("int"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def int8_dequantize(qs: Column | str) -> Column:
    """Inverse of ``int8_quantize``: ``v_i ≈ q_i * scale`` (max abs
    reconstruction error = scale/2)."""
    qs = F.col(qs) if isinstance(qs, str) else qs
    scale = qs.getField("scale")
    return F.transform(qs.getField("q"), lambda x: x.cast("double") * scale)


# one literal long per bit; bit 63 is the sign bit, representable only
# as the negative two's-complement value (same trick as dedup.simhash64)
_POW2_64 = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def binary_quantize(a: Column | str) -> Column:
    """Sign-bit binary quantization: 64 dims → ONE long (64 bytes of
    float32 → 8 bytes, the 32× compression step before Hamming-space
    search). Bit b is set iff ``v[b] > 0``; dims beyond 64 are
    TRUNCATED (one long covers 64 dims) — identically to the driver
    twin :func:`python_binary_quantize`, so the two stay bit-equal on
    any input width. Without the slice, zip_with pads the 64-entry
    mask with nulls on longer vectors and the OR-fold silently returns
    NULL — which sorts FIRST in an ascending Hamming top-k. Pure
    codegen: a single zip_with against the bit-mask literal + one OR
    fold.
    """
    v = _as_double(a)
    return F.aggregate(
        F.zip_with(
            F.slice(v, 1, 64),
            F.lit(_POW2_64),
            lambda x, p: F.when(x > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s.bitwiseOR(x),
    )


def python_binary_quantize(vec: list[float]) -> int:
    """Driver-side twin of :func:`binary_quantize` for plan-time probe
    constants (must stay bit-identical to the codegen version)."""
    sig = 0
    for b, x in enumerate(vec[:64]):
        if x > 0:
            sig |= 1 << b
    # bit 63 set → negative two's-complement long
    if sig >= 1 << 63:
        sig -= 1 << 64
    return sig


# The 16 NF4 quantile levels (Dettmers et al., QLoRA 2023): equal-mass
# quantiles of N(0,1) rescaled to [-1, 1], the information-theoretically
# optimal 4-bit codebook for normally-distributed weights/embeddings.
NF4_LEVELS = [
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
]
# nearest-level search as midpoint thresholds: index = #{midpoints < x},
# with ties (x exactly on a midpoint) resolving to the LOWER level —
# the deterministic first-argmin, identical in any engine comparing
# the same double literals
_NF4_MIDS = [
    (NF4_LEVELS[i] + NF4_LEVELS[i + 1]) / 2.0 for i in range(15)
]


def nf4_quantize(a: Column | str) -> Column:
    """NF4 4-bit block quantization (QLoRA): ``scale = max|v|``,
    each ``v_i/scale`` snaps to the nearest of the 16 NormalFloat
    levels. Returns ``struct(scale double, q array<int>)`` with codes
    in [0, 15] — 8× smaller than float32, the storage tier below int8
    for embedding corpora whose values are roughly normal (which
    trained embeddings are). Nearest-level search is 15 midpoint
    comparisons in pure codegen (no sort, no UDF); zero vectors code
    to level 7 (= 0.0) at scale 0."""
    a = _as_double(a)
    mids = F.array(*[F.lit(m) for m in _NF4_MIDS])
    scale = F.aggregate(a, F.lit(0.0), lambda s, x: F.greatest(s, F.abs(x)))
    q = F.when(
        scale == 0.0, F.transform(a, lambda x: F.lit(7))
    ).otherwise(
        F.transform(
            a,
            lambda x: F.size(F.filter(mids, lambda m: x / scale > m)).cast(
                "int"
            ),
        )
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def nf4_dequantize(qs: Column | str) -> Column:
    """Inverse of ``nf4_quantize``: ``v_i ≈ level[q_i] · scale``."""
    qs = F.col(qs) if isinstance(qs, str) else qs
    levels = F.array(*[F.lit(v) for v in NF4_LEVELS])
    scale = qs.getField("scale")
    return F.transform(
        qs.getField("q"),
        lambda i: F.element_at(levels, i + 1) * scale,
    )


def affine_quantize(a: Column | str) -> Column:
    """ASYMMETRIC uint8 (affine) scalar quantization — the other
    standard 8-bit scheme next to :func:`int8_quantize`'s symmetric
    one: ``scale = (max − min) / 255``, ``zero_point =
    round(−min/scale)`` clamped to [0, 255], ``q_i = round(v_i/scale)
    + zero_point``. For skewed value ranges (ReLU activations,
    non-centered embeddings) the affine grid spends ALL 256 codes on
    the occupied interval where the symmetric grid wastes half —
    reconstruction error halves on one-sided data. Returns
    ``struct(scale double, zero_point int, q array<int>)``; constant
    vectors quantize to scale 0, zero_point 0, all-zero codes (the
    value lives in the dequantize min term, carried by scale = 0
    convention: dequantize returns min + 0)."""
    a = _as_double(a)
    mn = F.aggregate(
        a, F.element_at(a, 1), lambda s, x: F.least(s, x)
    )
    mx = F.aggregate(
        a, F.element_at(a, 1), lambda s, x: F.greatest(s, x)
    )
    scale = (mx - mn) / F.lit(255.0)
    zp = F.when(scale == 0.0, F.lit(0)).otherwise(
        F.least(
            F.lit(255),
            F.greatest(F.lit(0), F.round(-mn / scale, 0).cast("int")),
        )
    )
    q = F.when(
        scale == 0.0, F.transform(a, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            a,
            lambda x: F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    (F.round(x / scale, 0).cast("int") + zp),
                ),
            ),
        )
    )
    return F.struct(
        scale.alias("scale"), zp.alias("zero_point"), q.alias("q")
    )


def affine_dequantize(qs: Column | str, mn: Column | None = None) -> Column:
    """Inverse of :func:`affine_quantize`:
    ``v_i ≈ (q_i − zero_point) · scale``; a constant vector
    (scale 0) dequantizes to ``mn`` when the caller carries the
    original minimum, else zeros."""
    qs = F.col(qs) if isinstance(qs, str) else qs
    scale = qs.getField("scale")
    zp = qs.getField("zero_point")
    base = F.transform(
        qs.getField("q"),
        lambda x: (x.cast("double") - zp.cast("double")) * scale,
    )
    if mn is None:
        return base
    return F.when(
        scale == 0.0, F.transform(base, lambda _: mn)
    ).otherwise(base)
