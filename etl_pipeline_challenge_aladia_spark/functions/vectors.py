"""Vector column helpers for embedding similarity (north-star scope).

All JVM-side higher-order functions — no Python UDFs. ``F.aggregate`` folds
left-to-right, giving a deterministic summation order (important for
cross-engine comparisons and reproducible ranking).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> -> array<double> so all arithmetic is f64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    """L2 norm of an array<double> column."""
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is zero."""
    denom = norm_col(a) * norm_col(b)
    return F.when(denom > 0, dot_col(a, b) / denom).otherwise(F.lit(0.0))
