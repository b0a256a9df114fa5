"""Entity resolution — multi-pass-blocked fuzzy matching.

The reference has no record-linkage surface; this is the extension
family (SURVEY.md X3) a migration between vector stores needs when
the id spaces don't line up and rows must be re-keyed by a dirty
natural key (names, titles, URLs).

Scale design: candidate generation is NEVER a cross join. Each
blocking pass is a plain equi-join on a caller-chosen key expression
(prefix, suffix, digit window, phonetic code, ...), and the passes
union — the standard multi-pass blocking guarantee: a pair is a
candidate iff at least one pass keeps its key intact under the
expected corruption. At 100 TB each pass is one hash-partitioned
shuffle on its key; block skew is bounded by the key's selectivity
(the caller picks keys with the NDV the data supports) and AQE
splits any hot block. The expensive predicate (edit distance) runs
only on the blocked candidates, JVM-side via `levenshtein` inside
whole-stage codegen — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def blocked_candidates(
    left: DataFrame,
    right: DataFrame,
    block_keys: list[tuple[Column, Column]],
    *,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Distinct (left_id, right_id) candidate pairs from the union of
    one equi-join per blocking pass.

    ``block_keys`` is a list of (left_key_expr, right_key_expr)
    pairs; each pass joins on equality of its pair. The union is
    deduplicated on the id pair only — an id-width shuffle, never a
    payload-width one.
    """
    if not block_keys:
        raise ValueError("block_keys must be non-empty")
    passes = []
    for i, (lk, rk) in enumerate(block_keys):
        l = left.select(F.col(left_id), lk.alias(f"__bk{i}"))
        r = right.select(F.col(right_id), rk.alias(f"__bk{i}"))
        passes.append(l.join(r, f"__bk{i}").select(left_id, right_id))
    out = passes[0]
    for p in passes[1:]:
        out = out.unionAll(p)
    return out.distinct()


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, str],
    block_keys: list[tuple[Column, Column]],
    *,
    left_id: str,
    right_id: str,
    max_dist: int = 1,
) -> DataFrame:
    """Blocked fuzzy equi-join: candidates from multi-pass blocking,
    then Levenshtein distance on the text pair, kept when
    ``dist <= max_dist``.

    Returns (left_id, right_id, dist). Join back on the ids for
    payload columns — keeping the match table id-only keeps every
    shuffle in this operator id-width.
    """
    lcol, rcol = on
    cand = blocked_candidates(
        left, right, block_keys, left_id=left_id, right_id=right_id
    )
    l = left.select(left_id, F.col(lcol).alias("__ltext"))
    r = right.select(right_id, F.col(rcol).alias("__rtext"))
    return (
        cand.join(l, left_id)
        .join(r, right_id)
        # bounded variant (r13): with a threshold the JVM computes the
        # banded O(len·k) distance and returns -1 past the bound — the
        # full O(len²) matrix was burned on every candidate only to be
        # filtered. Kept rows (dist ≤ max_dist) get the exact same
        # distance value, so results are unchanged.
        .withColumn(
            "dist",
            F.levenshtein(
                "__ltext", "__rtext", int(max_dist)
            ).cast("long"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select(left_id, right_id, "dist")
    )


def best_match(
    pairs: DataFrame,
    *,
    left_id: str,
    right_id: str,
    dist_col: str = "dist",
) -> DataFrame:
    """One row per left id: the minimum-distance match, ties broken
    by the smallest right id (deterministic across engines). A window
    partitioned by left id — the shuffle is candidate-pair-sized,
    already bounded by blocking."""
    w = Window.partitionBy(left_id).orderBy(
        F.col(dist_col).asc(), F.col(right_id).asc()
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
