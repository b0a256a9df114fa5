"""Column-level function library (all JVM-side, codegen-friendly)."""

from vectordb_migrator_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    l2_normalize,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "l2_normalize",
]
