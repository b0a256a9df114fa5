"""Gram-matrix / PCA operators — NumPy differentials (the oracle for
linear algebra no SQL engine can express)."""

from __future__ import annotations

import numpy as np

from vectordb_migrator_spark.operators.decomposition import (
    gram_matrix,
    pca_fit,
    rotate_vectors,
)


def _x(embeddings):
    rows = embeddings.orderBy("vec_id").collect()
    return np.array([list(r["embedding"]) for r in rows], dtype=np.float64)


def test_gram_matrix_matches_numpy(spark, embeddings):
    gram, colsum, n = gram_matrix(embeddings)
    x = _x(embeddings)
    assert n == len(x)
    np.testing.assert_allclose(gram, x.T @ x, rtol=1e-9)
    np.testing.assert_allclose(colsum, x.sum(axis=0), rtol=1e-9)


def test_gram_matrix_partition_invariant(spark, embeddings):
    """The partial-reduce must be partition-count-invariant (the
    whole point: partials sum associatively)."""
    g1, s1, n1 = gram_matrix(embeddings.repartition(1))
    g7, s7, n7 = gram_matrix(embeddings.repartition(7))
    assert n1 == n7
    np.testing.assert_allclose(g1, g7, rtol=1e-9)
    np.testing.assert_allclose(s1, s7, rtol=1e-9)


def test_pca_fit_matches_numpy_cov(spark, embeddings):
    gram, colsum, n = gram_matrix(embeddings)
    comps, evr = pca_fit(gram, colsum, n)
    x = _x(embeddings)
    cov = np.cov(x, rowvar=False, bias=True)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(evr, vals, atol=1e-9)
    # components are orthonormal and diagonalize the covariance
    np.testing.assert_allclose(comps @ comps.T, np.eye(comps.shape[0]),
                               atol=1e-9)
    np.testing.assert_allclose(comps @ cov @ comps.T, np.diag(evr),
                               atol=1e-8)
    # deterministic sign: the largest-|coeff| entry of each row is >= 0
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] >= 0


def test_rotate_vectors_matches_numpy_and_preserves_distance(spark, embeddings):
    gram, colsum, n = gram_matrix(embeddings)
    comps, _ = pca_fit(gram, colsum, n)
    out = rotate_vectors(embeddings, comps).orderBy("vec_id").collect()
    x = _x(embeddings)
    y = np.array([list(r["rotated"]) for r in out])
    np.testing.assert_allclose(y, x @ comps.T, rtol=1e-9)
    # orthogonality: pairwise distance of the first two rows preserved
    d0 = np.linalg.norm(x[0] - x[1])
    d1 = np.linalg.norm(y[0] - y[1])
    np.testing.assert_allclose(d0, d1, rtol=1e-9)
    # passthrough columns intact
    assert [r["vec_id"] for r in out] == sorted(r["vec_id"] for r in out)
    assert "label" in out[0].asDict()


def test_x9_pca_evr_differential(spark):
    """The rows-only suite query against an independent NumPy replay —
    the driver gate records rows-only for eigensolver queries, so this
    differential IS their correctness evidence."""
    from tests.conftest import SF_DIR
    from vectordb_migrator_spark.suite import QUERIES

    out = {r["component"]: r for r in
           QUERIES["x9_pca_evr"](spark, SF_DIR).collect()}
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    x = _x(emb)
    cov = np.cov(x, rowvar=False, bias=True)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    total = vals.sum()
    for i in range(8):
        np.testing.assert_allclose(out[i]["variance"], vals[i], atol=2e-6)
        np.testing.assert_allclose(out[i]["evr"], vals[i] / total, atol=2e-6)
        np.testing.assert_allclose(
            out[i]["cum_evr"], vals[: i + 1].sum() / total, atol=2e-6
        )


def test_x9_opq_rotation_error_differential(spark):
    """Full NumPy replay of the PCA-rotated PQ error report: same
    rotation (sign convention replicated independently), same sampled
    codebooks, same per-subspace argmin — mse_mean/mse_max must agree
    to the query's rounding."""
    from tests.conftest import SF_DIR
    from vectordb_migrator_spark.suite import QUERIES

    out = {
        (r["layout"], r["s"]): (r["mse_mean"], r["mse_max"])
        for r in QUERIES["x9_opq_rotation_error"](spark, SF_DIR).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.orderBy("vec_id").collect()
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    # independent replica of the fit incl. the sign convention
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    comps = vecs[:, order].T.copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    seeds = x[[ids.index(i) for i in range(16)]]
    layouts = {"identity": (x, seeds), "rotated": (x @ comps.T, seeds @ comps.T)}
    for tag, (xs, cb) in layouts.items():
        for s in range(4):
            sub = xs[:, s * 16:(s + 1) * 16]
            cbsub = cb[:, s * 16:(s + 1) * 16]
            d2 = ((sub[:, None, :] - cbsub[None, :, :]) ** 2).sum(axis=2)
            mdist = d2.min(axis=1)
            got_mean, got_max = out[(tag, s)]
            np.testing.assert_allclose(got_mean, mdist.mean(), atol=2e-6)
            np.testing.assert_allclose(got_max, mdist.max(), atol=2e-6)


def test_jl_sign_matrix_deterministic_and_prefix_stable():
    import hashlib

    from vectordb_migrator_spark.operators.decomposition import (
        jl_sign_matrix,
    )

    m32 = jl_sign_matrix(32, 64)
    m8 = jl_sign_matrix(8, 64)
    assert m32[:8] == m8  # prefix-stable: one wide projection serves all
    assert all(v in (1.0, -1.0) for row in m32 for v in row)
    # spot-check the md5 convention the SQL oracle replays
    h = int(hashlib.md5(b"jl-3-17").hexdigest()[:8], 16)
    assert m32[3][17] == (1.0 if h % 2 == 0 else -1.0)


def test_jl_project_matches_numpy(spark, embeddings):
    from vectordb_migrator_spark.operators.decomposition import (
        jl_project,
        jl_sign_matrix,
    )

    x = _x(embeddings)
    s = np.array(jl_sign_matrix(16, x.shape[1]))
    want = x @ s.T
    got = (
        jl_project(embeddings, out_dim=16, in_dim=x.shape[1], out_col="pv")
        .orderBy("vec_id")
        .collect()
    )
    np.testing.assert_allclose(
        np.array([list(r["pv"]) for r in got]), want, atol=1e-9
    )
    # in_dim omitted -> derived from the data, same result
    auto = jl_project(embeddings, out_dim=16, out_col="pv").orderBy("vec_id")
    np.testing.assert_allclose(
        np.array([list(r["pv"]) for r in auto.collect()]), want, atol=1e-9
    )


def test_jl_project_stays_jvm_side(spark, embeddings):
    """Sign projection must be pure codegen — no Python workers in the
    plan (rotate_vectors is the Arrow path for DENSE rotations)."""
    from vectordb_migrator_spark.operators.decomposition import jl_project

    plan = (
        jl_project(embeddings, out_dim=8, in_dim=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan, plan


def test_whitening_matches_numpy_and_identity_cov(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.decomposition import (
        gram_matrix,
        whiten_vectors,
        whitening_fit,
    )

    rng = np.random.default_rng(7)
    # correlated 4-dim data with wildly different scales
    base = rng.standard_normal((300, 4))
    mix = np.array(
        [[3.0, 0, 0, 0], [1.0, 0.5, 0, 0], [0, 0, 10.0, 0], [0, 0, 2.0, 0.1]]
    )
    x = base @ mix.T + np.array([5.0, -2.0, 0.0, 100.0])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        "id long, embedding array<double>",
    )
    gram, colsum, n = gram_matrix(df, vec_col="embedding")
    w, mu = whitening_fit(gram, colsum, n)

    # differential: fit replicated in pure NumPy
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    w_np = vecs @ np.diag(1.0 / np.sqrt(np.clip(vals, 1e-6, None))) @ vecs.T
    assert np.allclose(w, w_np, atol=1e-8)
    assert np.allclose(mu, x.mean(axis=0), atol=1e-9)

    got = np.array(
        [
            r["whitened"]
            for r in whiten_vectors(df, w, mu)
            .orderBy("id")
            .select("whitened")
            .collect()
        ]
    )
    assert np.allclose(got, (x - mu) @ w.T, atol=1e-9)
    # whitened covariance is the identity
    assert np.allclose(np.cov(got, rowvar=False, bias=True), np.eye(4), atol=1e-6)
    # ZCA = symmetric whitener
    assert np.allclose(w, w.T, atol=1e-10)

    # pca kind also whitens but rotates onto components
    w_pca, _ = whitening_fit(gram, colsum, n, kind="pca")
    got_pca = (x - mu) @ w_pca.T
    assert np.allclose(
        np.cov(got_pca, rowvar=False, bias=True), np.eye(4), atol=1e-6
    )


def test_gram_partial_collect_bounded_by_merge_partitions(spark):
    """r6 verdict #7: the driver collect must be bounded by
    merge_partitions however many partitions the input scan has —
    and the merged statistics must still match NumPy exactly enough
    for the fit."""
    import numpy as np

    from vectordb_migrator_spark.operators.decomposition import (
        _gram_partial_rows,
        gram_matrix,
    )

    rng = np.random.default_rng(11)
    x = rng.normal(size=(400, 6))
    df = spark.createDataFrame(
        [(v.tolist(),) for v in x], "embedding array<double>"
    ).repartition(64)  # many more input partitions than merge slots

    rows = _gram_partial_rows(df, "embedding", 4)
    assert 1 <= len(rows) <= 4

    gram, colsum, n = gram_matrix(df, merge_partitions=4)
    assert n == 400
    np.testing.assert_allclose(gram, x.T @ x, rtol=1e-9)
    np.testing.assert_allclose(colsum, x.sum(axis=0), rtol=1e-9)


def test_hadamard_rotation_flattens_planted_outliers(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.decomposition import (
        hadamard_rotation_report,
    )

    rng = np.random.default_rng(5)
    # outlier-coordinate corpus: one hot dim carries 30x the energy —
    # exactly the shape per-vector int8 max-scaling wastes bits on
    x = np.round(rng.standard_normal((64, 64)) * 0.05, 4)
    x[:, 7] += 3.0
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    r = hadamard_rotation_report(df).first()
    assert r["n"] == 64
    assert bool(r["norm_preserved"])  # exact integer certificate
    assert r["peak_to_rms_after"] < 0.5 * r["peak_to_rms_before"]
    assert r["mse_improvement_x"] > 3.0  # int8 error collapses


def test_hadamard_rotation_isometric_on_flat_vectors(spark):
    from vectordb_migrator_spark.operators.decomposition import (
        hadamard_rotation_report,
    )

    # already-flat vectors: rotation cannot help, and must not hurt
    # by more than the re-rounding epsilon
    df = spark.createDataFrame(
        [(i, [1.0 if (j + i) % 2 == 0 else -1.0 for j in range(64)])
         for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    r = hadamard_rotation_report(df).first()
    assert bool(r["norm_preserved"])
    assert r["peak_to_rms_before"] == 1.0  # |v|/rms = 1 exactly


def test_rabitq_estimator_corr_constant_and_exact_case(spark):
    import numpy as np
    import pytest

    from vectordb_migrator_spark.operators.decomposition import (
        rabitq_estimate_report,
    )

    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.randn(64) * 0.5]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probe = [float(x) for x in rng.randn(64) * 0.5]
    r = rabitq_estimate_report(df, probe, d=64, k=10).first()
    assert r["n"] == 300
    # for incoherent (gaussian) vectors the corrective factor
    # concentrates at E|g| / sqrt(E g^2) = sqrt(2/pi) ~ 0.7979
    assert abs(r["avg_corr"] - 0.7979) < 0.01
    assert 0 < r["mean_abs_err"] < 0.2
    assert 0 <= r["recall_at_10"] <= 1.0

    # exact-code case: x = e1 rotates to a constant-sign vector
    # (Sylvester H's first column is all +1), so the sign code IS the
    # direction: corr = 1 and the corrected estimate equals the true
    # cosine exactly
    e1 = [1.0] + [0.0] * 63
    df1 = spark.createDataFrame(
        [(0, e1)], "vec_id long, embedding array<float>"
    )
    r1 = rabitq_estimate_report(df1, probe, d=64, k=10).first()
    assert r1["avg_corr"] == 1.0
    assert r1["mean_abs_err"] == 0.0

    with pytest.raises(ValueError):
        rabitq_estimate_report(df, probe, d=63)


def test_power_iteration_pc1_matches_python_replica(spark):
    import numpy as np

    from vectordb_migrator_spark.operators.decomposition import (
        power_iteration_pc1,
    )

    # planted dominant direction: dim 2 has 10x the variance
    rng = np.random.RandomState(11)
    x = rng.randn(200, 8)
    x[:, 2] *= 10.0
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, embedding array<float>",
    )
    got = power_iteration_pc1(df, d=8, iters=8).first()

    # exact pure-Python replica of the integer trajectory (reads the
    # float32-stored values back, like the engine does)
    stored = np.array(
        [r["embedding"] for r in df.orderBy("id").collect()], dtype=np.float64
    )
    xi = np.where(
        stored >= 0,
        np.floor(stored * 100 + 0.5),
        -np.floor(-stored * 100 + 0.5),
    ).astype(object)  # python ints -> no overflow anywhere
    n = len(xi)
    sx = xi.sum(axis=0)
    c = n * (xi.T @ xi) - np.outer(sx, sx)
    m = int(abs(c).max())
    g = max(1, m >> 18)
    b = np.vectorize(lambda v: (v // g) if v >= 0 else -((-v) // g))(c)
    prev = cur = np.array([10_000] * 8, dtype=object)
    for _ in range(8):
        w = b @ cur
        mw = int(abs(w).max())
        if mw <= 0:
            break
        prev, cur = cur, np.vectorize(
            lambda v: (v * 10_000) // mw
            if v >= 0
            else -(((-v) * 10_000) // mw)
        )(w)
    vtv, ptp = int(cur @ cur), int(prev @ prev)
    vp, vbv = int(cur @ prev), int(cur @ (b @ cur))
    trace = int(np.trace(b))
    assert got["n"] == n
    assert got["evr1"] == round(float(vbv) / float(vtv) / float(trace), 6)
    assert got["align"] == round(
        float(vp) / float(np.sqrt(float(vtv) * float(ptp))), 6
    )
    assert got["top_dim"] == 2  # the planted dominant direction
    assert got["evr1"] > 0.9  # 10x-variance dim dominates the trace
    assert abs(got["align"]) > 0.999  # converged

    # degenerate scatter -> NULL metrics, never a division error
    const = spark.createDataFrame(
        [(i, [3.0] * 8) for i in range(5)], "id long, embedding array<float>"
    )
    r = power_iteration_pc1(const, d=8).first()
    assert r["evr1"] is None and r["align"] is None
    assert r["top_dim"] is None and r["top_loading"] is None


def test_power_iteration_pc1_overflow_guard_raises(spark):
    # r10 ADVICE: past n*mx > ~2.1e9 the int64 scatter would WRAP
    # silently (non-ANSI Spark) — the query must raise, not return
    # wrong principal components. One row with a 3e7-magnitude
    # coordinate at coord_scale=100 puts n*mx = 3e9 over the bound.
    import pytest

    from vectordb_migrator_spark.operators.decomposition import (
        power_iteration_pc1,
    )

    big = spark.createDataFrame(
        [(0, [3.0e7] + [0.0] * 7), (1, [1.0] * 8)],
        "id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="int64-exact"):
        power_iteration_pc1(big, d=8).first()


def test_power_iteration_pc2_planted_directions(spark):
    """Deflation certificate: two planted orthogonal high-variance
    axes (var 1.0 on dim 2, 0.36 on dim 5 over 0.0025 noise) must
    come back as evr1 > evr2 with both near their variance shares,
    the iterates near-orthogonal, and PC2 converged."""
    import random

    from vectordb_migrator_spark.operators.decomposition import (
        power_iteration_pc2,
    )

    random.seed(3)
    rows = []
    for i in range(400):
        v = [random.gauss(0, 0.05) for _ in range(8)]
        v[2] += random.gauss(0, 1.0)
        v[5] += random.gauss(0, 0.6)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    r = power_iteration_pc2(df, d=8).first()
    assert r["evr1"] > r["evr2"] > 0.2
    assert r["cum_evr"] > 0.95
    assert abs(r["ortho"]) < 0.01  # deflation annihilated PC1
    assert r["align2"] > 0.999

    # rank-1 input: PC2 metrics NULL, evr1 kept
    one_dir = spark.createDataFrame(
        [(i, [float(i % 5)] + [0.0] * 7) for i in range(50)],
        "id long, embedding array<float>",
    )
    r1 = power_iteration_pc2(one_dir, d=8).first()
    assert r1["evr1"] is not None and r1["evr1"] > 0.99
    # constant input: everything NULL, never a division error
    const = spark.createDataFrame(
        [(i, [2.0] * 8) for i in range(5)],
        "id long, embedding array<float>",
    )
    rc = power_iteration_pc2(const, d=8).first()
    assert rc["evr1"] is None and rc["evr2"] is None


def test_whitening_fp_certificate_planted_directions(spark):
    """r12: two planted orthogonal variance axes -> corr12 near 0
    (the whiteness certificate), projection EVRs agree with both the
    Rayleigh quotient and a NumPy eigh differential, gap_ratio near
    the planted variance ratio, iterates near-orthogonal."""
    import random

    import numpy as np

    from vectordb_migrator_spark.operators.decomposition import (
        whitening_fp_certificate,
    )

    random.seed(7)
    rows = []
    for i in range(500):
        v = [random.gauss(0, 0.05) for _ in range(8)]
        v[1] += random.gauss(0, 1.0)
        v[6] += random.gauss(0, 0.5)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    r = whitening_fp_certificate(df, d=8).first()

    x = np.array([row[1] for row in rows])
    cov = np.cov(x, rowvar=False, bias=True)
    ev = np.sort(np.linalg.eigvalsh(cov))[::-1]
    evr = ev / ev.sum()
    assert abs(r["evr1_proj"] - evr[0]) < 0.02
    assert abs(r["evr2_proj"] - evr[1]) < 0.02
    assert abs(r["evr1_proj"] - r["evr1_rayleigh"]) < 0.01
    assert abs(r["corr12"]) < 0.05  # whitened off-diagonal
    assert abs(r["ortho"]) < 0.01
    assert 2.5 < r["gap_ratio"] < 6.0  # planted 1.0 vs 0.25 variance

    # rank-1 input: deflation leaves only truncation residue, PC2
    # realigns with PC1 — the certificate FLAGS it (ortho -> 1) and
    # corr12 -> 1 is the true statement (two projections of rank-1
    # data are perfectly correlated); evr1 kept
    one_dir = spark.createDataFrame(
        [(i, [float(i % 5)] + [0.0] * 7) for i in range(50)],
        "id long, embedding array<float>",
    )
    r1 = whitening_fp_certificate(one_dir, d=8).first()
    assert r1["evr1_proj"] is not None and r1["evr1_proj"] > 0.99
    assert abs(r1["ortho"]) > 0.99 and abs(r1["corr12"]) > 0.99
    # constant input: all metrics NULL, never a division error
    const = spark.createDataFrame(
        [(i, [2.0] * 8) for i in range(5)],
        "id long, embedding array<float>",
    )
    rc = whitening_fp_certificate(const, d=8).first()
    assert rc["evr1_proj"] is None and rc["corr12"] is None


def test_evr_ladder_fp_matches_numpy_ladder(spark):
    """r12: three planted variance axes -> the fixed-point ladder's
    EVRs track NumPy's top-3 eigenvalue shares, cum_evr is their
    running sum, every component converged (align -> 1) and deflated
    (max_cross -> 0); on rank-2 input component 3's max_cross
    certificate flags the exhausted deflation."""
    import random

    import numpy as np

    from vectordb_migrator_spark.operators.decomposition import (
        evr_ladder_fp,
    )

    random.seed(13)
    rows = []
    for i in range(600):
        v = [random.gauss(0, 0.04) for _ in range(8)]
        v[0] += random.gauss(0, 1.2)
        v[3] += random.gauss(0, 0.7)
        v[5] += random.gauss(0, 0.4)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    out = {r["component"]: r for r in evr_ladder_fp(df, d=8).collect()}
    assert sorted(out) == [1, 2, 3]

    x = np.array([row[1] for row in rows])
    cov = np.cov(x, rowvar=False, bias=True)
    ev = np.sort(np.linalg.eigvalsh(cov))[::-1]
    evr = ev / ev.sum()
    for j in (1, 2, 3):
        assert abs(out[j]["evr"] - evr[j - 1]) < 0.02, j
        assert out[j]["align"] > 0.995, j
    assert out[1]["max_cross"] is None
    assert out[2]["max_cross"] < 0.02 and out[3]["max_cross"] < 0.02
    assert abs(
        out[3]["cum_evr"]
        - round(out[1]["evr"] + out[2]["evr"] + out[3]["evr"], 6)
    ) < 1e-9
    assert out[1]["evr"] > out[2]["evr"] > out[3]["evr"]

    # rank-2 input: components 1-2 genuine (tiny max_cross), the
    # third deflation is truncation residue only — v3 realigns with
    # the span of v1/v2 and max_cross flags it
    rows2 = [
        (i, [float(i % 7), float((3 * i) % 5), 0.0, 0.0])
        for i in range(60)
    ]
    df2 = spark.createDataFrame(rows2, "id long, embedding array<float>")
    out2 = {r["component"]: r for r in evr_ladder_fp(df2, d=4).collect()}
    assert out2[1]["evr"] is not None and out2[2]["evr"] is not None
    assert abs(round(out2[2]["cum_evr"], 5) - 1.0) < 2e-4
    assert out2[2]["max_cross"] < 0.01
    assert out2[3]["max_cross"] > 0.5  # exhaustion certificate


def test_opq_givens_balance_fp_balances_planted_variance(spark):
    """r12: variance planted in one subspace -> the greedy Givens
    sweep moves it across subspaces (spread falls monotonically up to
    truncation noise), rotation stays near-orthogonal, constant input
    yields an all-identity trajectory, and the run is deterministic."""
    import random

    from vectordb_migrator_spark.operators.decomposition import (
        opq_givens_balance_fp,
    )

    random.seed(21)
    rows = []
    for i in range(400):
        v = [random.gauss(0, 0.03) for _ in range(8)]
        v[1] += random.gauss(0, 1.0)  # subspace 0 rich (m=2 -> 0..3)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    out = opq_givens_balance_fp(df, d=8, m=2, rounds=4).collect()
    assert [r["round"] for r in out] == [1, 2, 3, 4]
    for r in out:
        assert r["spread_after"] <= r["spread_before"] + 4
        assert r["ortho_defect"] <= 1e-3
        i_sub, j_sub = r["i"] // 4, r["j"] // 4
        if r["sin_s"] != 0:
            assert i_sub != j_sub  # rotations only ever cross subspaces
    assert out[-1]["spread_after"] < out[0]["spread_before"] * 0.5
    # chain: each round's spread_before == previous round's spread_after
    for a, b in zip(out, out[1:]):
        assert b["spread_before"] == a["spread_after"]

    # determinism
    out2 = opq_givens_balance_fp(df, d=8, m=2, rounds=4).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in out2]

    # constant input: zero scatter -> identity trajectory, zero defect
    const = spark.createDataFrame(
        [(i, [3.0] * 8) for i in range(20)],
        "id long, embedding array<float>",
    )
    for r in opq_givens_balance_fp(const, d=8, m=2, rounds=3).collect():
        assert (r["cos_s"], r["sin_s"]) == (10_000, 0)
        assert r["spread_before"] == r["spread_after"] == 0
        assert r["ortho_defect"] == 0.0
