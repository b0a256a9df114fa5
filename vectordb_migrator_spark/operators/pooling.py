"""Per-group embedding pooling (chunk → document rollups).

Training pipelines chunk documents (``operators/chunking.py``), embed
each chunk, then need ONE vector per document back — mean or max
pooling over the chunk embeddings. The reference engine has no
pooling operator; this is the Spark-native composition:

- One shuffle on the group key (``collect_list`` of the chunk
  vectors), then a pure-codegen ``aggregate``/``zip_with`` fold —
  no Python UDF, no per-element explode. Chunks-per-document is
  bounded by construction (documents were chunked with a fixed
  window), so the per-group list is small; the shuffle moves exactly
  the input vectors once. An exploded (group, pos, val) plan would
  move dim× more rows into the same exchange.
- Mean pooling sums through a fixed-scale DECIMAL accumulator, which
  makes the sum order-independent (float summation order varies with
  partitioning); the final divide happens once in double. Max pooling
  is order-free by nature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: decimal(25,10): 15 integer digits — exact for |v|<=1e5-ish chunk
#: embedding sums; addition stays order-independent unlike doubles.
_ACC = "decimal(25,10)"


def _mean_fold(lst: Column) -> Column:
    init = F.transform(F.element_at(lst, 1), lambda x: F.lit(0).cast(_ACC))
    total = F.aggregate(
        lst,
        init,
        lambda acc, v: F.zip_with(
            acc, v, lambda a, x: (a + x.cast(_ACC)).cast(_ACC)
        ),
    )
    n = F.size(lst)
    return F.transform(total, lambda s: s.cast("double") / n)


def _max_fold(lst: Column) -> Column:
    return F.aggregate(
        F.slice(lst, 2, F.size(lst) - 1),
        F.element_at(lst, 1),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: F.greatest(a, b)),
    )


_FOLDS = {"mean": _mean_fold, "max": _max_fold}


def pool_vectors(
    df: DataFrame,
    *,
    group_col: str,
    vec_col: str,
    modes: str | tuple[str, ...] = "mean",
) -> DataFrame:
    """Pool ``vec_col`` arrays per ``group_col``: one row per group
    with an elementwise ``<mode>_vec`` column per requested mode. All
    vectors in a group must share one dimensionality (chunk embeddings
    do). Requesting several modes still costs ONE shuffle — both folds
    run over the same collected list."""
    if isinstance(modes, str):
        modes = (modes,)
    bad = [m for m in modes if m not in _FOLDS]
    if bad:
        raise ValueError(f"unknown pooling mode(s) {bad}; have {sorted(_FOLDS)}")
    lst = F.col("__vecs")
    return (
        df.select(group_col, F.col(vec_col).cast("array<double>").alias(vec_col))
        .groupBy(group_col)
        .agg(F.collect_list(vec_col).alias("__vecs"))
        .select(
            group_col,
            *[_FOLDS[m](lst).alias(f"{m}_vec") for m in modes],
        )
    )
