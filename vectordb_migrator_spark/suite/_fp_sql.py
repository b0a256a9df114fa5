"""Shared DuckDB SQL-text builders for the fixed-point eigen-family
oracles (round 12) — the generalization of ``s13_round11._pd_sql``'s
recursive-CTE scaffolding to an arbitrary deflation-ladder depth, so
``x9_whitening_fp`` (ladder depth 2 + a projection pass) and
``x9_evr_ladder_fp`` (depth 3) replay the engine's integer arithmetic
term for term without re-hand-writing 100 lines of CTE text each.
The round-11 ``x9_power_deflation`` oracle keeps its own frozen text.

Every builder mirrors a specific integer step of
``operators/decomposition.py`` (`_fp_scatter_partials` +
`_py_scatter_row`, `_py_power`, `_py_deflate`): the sign-symmetric coordinate quantizer, the exact
int64 centered scatter, the shift/divide rescale gates, the power
loops, and the integer Hotelling deflation — all at the family's
pinned constants (coord_scale=100, vec_scale=10⁴, b_shift=18,
t_shift=26, d=64, iters=8).
"""

from __future__ import annotations

D = 64
ITERS = 8

#: the family's sign-symmetric half-away-from-zero quantizer at
#: coord_scale=100 (mirrors `_fp_scatter_partials`'s NumPy kernel and
#: `_fp_quantize`)
FX = (
    "list_transform(embedding::DOUBLE[], x -> (CASE WHEN x >= 0 "
    "THEN floor(x * 100.0 + 0.5) ELSE -floor(-x * 100.0 + 0.5) "
    "END)::BIGINT)"
)


def sidiv(x: str, q: str) -> str:
    """Signed truncating integer division — `_fp_sidiv`'s SQL text."""
    return (
        f"(CASE WHEN ({x}) >= 0 THEN ((({x}) - ({x}) % ({q})) / ({q}))"
        f" ELSE -(((-({x})) - (-({x})) % ({q})) / ({q})) END)::BIGINT"
    )


def power_cte(j: int, mat_src: str, mat_col: str) -> str:
    """The 8-step fixed-point power loop over ``{mat_src}.{mat_col}``
    as a recursive CTE ``it{j}`` plus ``fin{j}`` (prev=p{j},
    cur=v{j}) — `_py_power`'s SQL twin (renormalize to 10⁴ by exact
    truncating division each step; a zero matvec keeps the state)."""
    return f"""
    it{j} AS (
      SELECT 0 AS rk,
             [10000::BIGINT for _ in range({D})] AS prev,
             [10000::BIGINT for _ in range({D})] AS cur
      UNION ALL
      SELECT rk + 1,
             CASE WHEN mw <= 0 THEN prev ELSE cur END,
             CASE WHEN mw <= 0 THEN cur
                  ELSE [ (CASE WHEN x >= 0
                          THEN ((x * 10000 - (x * 10000) % mw) / mw)
                          ELSE -(((-x) * 10000 - ((-x) * 10000) % mw)
                                 / mw) END)::BIGINT
                         for x in w ] END
      FROM (
        SELECT rk, prev, cur, w,
               list_max(list_transform(w, x -> abs(x))) AS mw
        FROM (
          SELECT it{j}.rk, it{j}.prev, it{j}.cur,
                 [ list_sum([ m.{mat_col}[i * {D} + jj + 1]
                              * it{j}.cur[jj + 1]
                              for jj in range({D}) ])::BIGINT
                   for i in range({D}) ] AS w
          FROM it{j}, {mat_src} m WHERE it{j}.rk < {ITERS}))
    ),
    fin{j} AS (
      SELECT prev AS p{j}, cur AS v{j} FROM it{j} WHERE rk = {ITERS}
    )"""


def scatter_ctes() -> str:
    """``base`` → ``bmat`` — the exact int64 centered scatter
    C = n·Σxxᵀ − (Σx)(Σx)ᵀ and its shift/divide rescale, producing
    one row (n, cmax1, b1) — the scatter pipeline's SQL twin."""
    return f"""
    base AS MATERIALIZED (
      SELECT {FX} AS v FROM embeddings
    ),
    mom AS MATERIALIZED (
      SELECT (i - 1) * {D} + (j - 1) AS ij,
             sum(v[i] * v[j])::BIGINT AS sxx
      FROM base, range(1, {D + 1}) ti(i), range(1, {D + 1}) tj(j)
      GROUP BY 1
    ),
    sums AS MATERIALIZED (
      SELECT i - 1 AS i, sum(v[i])::BIGINT AS sx, count(*)::BIGINT AS n
      FROM base, range(1, {D + 1}) t(i) GROUP BY 1
    ),
    one AS (
      SELECT (SELECT list(sxx ORDER BY ij) FROM mom) AS sxx,
             (SELECT list(sx ORDER BY i) FROM sums) AS sx,
             (SELECT max(n) FROM sums) AS n
    ),
    cmat AS (
      SELECT n,
             [ (n * sxx[k + 1]
                - sx[(k // {D}) + 1] * sx[(k % {D}) + 1])::BIGINT
               for k in range({D * D}) ] AS c
      FROM one
    ),
    bmat AS MATERIALIZED (
      SELECT n,
             list_max(list_transform(c, x -> abs(x))) AS cmax1,
             [ {sidiv("x", "g")} for x in c ] AS b1
      FROM (
        SELECT n, c,
               greatest(1::BIGINT,
                        list_max(list_transform(c, x -> abs(x))) >> 18)
                 AS g
        FROM cmat)
    )"""


def defl_ctes(j: int, mat_src: str) -> str:
    """Integer Hotelling deflation of ``{mat_src}.b{j}`` with the
    iterate ``fin{j}.v{j}`` into ``mat{j+1}`` (s{j}, cmax{j+1},
    b{j+1}) — `_py_deflate`'s SQL twin: T = M·v rescaled by
    g₂ = max(1, max|T| >> 26), denominator vᵀT by g₂², exact
    truncating subtraction, then the 18-bit rescale gate."""
    tt = f"(c.t[(kk // {D}) + 1] * c.t[(kk % {D}) + 1])"
    return f"""
    dl{j}a AS (
      SELECT f.v{j} AS fv,
             [ list_sum([ m.b{j}[i * {D} + jj + 1] * f.v{j}[jj + 1]
                          for jj in range({D}) ])::BIGINT
               for i in range({D}) ] AS t0
      FROM {mat_src} m, fin{j} f
    ),
    dl{j}b AS (
      SELECT fv, t0,
             greatest(1::BIGINT,
                      list_max(list_transform(t0, x -> abs(x))) >> 26)
               AS g2,
             list_sum([ fv[i + 1] * t0[i + 1]
                        for i in range({D}) ])::BIGINT AS s
      FROM dl{j}a
    ),
    dl{j}c AS (
      SELECT s AS s{j},
             [ {sidiv("x", "g2")} for x in t0 ] AS t,
             greatest(1::BIGINT,
                      ((s - s % (g2 * g2)) / (g2 * g2))::BIGINT) AS sg
      FROM dl{j}b
    ),
    dl{j}d AS (
      SELECT c.s{j},
             [ (m.b{j}[kk + 1] - {sidiv(tt, "c.sg")})::BIGINT
               for kk in range({D * D}) ] AS c2
      FROM {mat_src} m, dl{j}c c
    ),
    mat{j + 1} AS MATERIALIZED (
      SELECT s{j},
             list_max(list_transform(c2, x -> abs(x))) AS cmax{j + 1},
             [ {sidiv("x", "g3")} for x in c2 ] AS b{j + 1}
      FROM (
        SELECT *,
               greatest(1::BIGINT,
                        list_max(list_transform(c2, x -> abs(x))) >> 18)
                 AS g3
        FROM dl{j}d)
    )"""


def ladder_ctes(k: int) -> str:
    """The full WITH-body for a depth-``k`` ladder: scatter, then for
    each j: power loop ``it{j}``/``fin{j}`` over ``mat{j}`` (mat1 =
    bmat/b1), and for j < k the deflation into ``mat{j+1}``."""
    parts = [scatter_ctes()]
    for j in range(1, k + 1):
        src = "bmat" if j == 1 else f"mat{j}"
        parts.append(power_cte(j, src, f"b{j}"))
        if j < k:
            parts.append(defl_ctes(j, src))
    return ",".join(parts)


def dot(a: str, b: str) -> str:
    """Exact int64 dot product of two 1-indexed SQL list columns."""
    return (
        f"list_sum([ {a}[i + 1] * {b}[i + 1] "
        f"for i in range({D}) ])::BIGINT"
    )


def rayleigh_num(mat: str, v: str) -> str:
    """vᵀ·M·v as exact int64 (`_fp_dot(v, _fp_matvec(M, v))`)."""
    return (
        f"list_sum([ {v}[i + 1] * "
        f"list_sum([ {mat}[i * {D} + jj + 1] * {v}[jj + 1] "
        f"for jj in range({D}) ]) for i in range({D}) ])::BIGINT"
    )


def trace(mat: str) -> str:
    """Σ diagonal of the row-major d×d list column as int64."""
    return (
        f"list_sum([ {mat}[i * {D} + i + 1] "
        f"for i in range({D}) ])::BIGINT"
    )
