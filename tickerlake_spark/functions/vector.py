"""Vector expression library for embedding columns (array<float/double>).

Pure Spark SQL higher-order functions — dot products and norms run inside
codegen over Arrow-backed arrays, no Python. For very wide vectors or batch
scoring, a Pandas-UDF path can be swapped in; at 64-1024 dims the built-in
expressions are the faster and simpler choice.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["as_double_array", "dot", "l2_norm", "cosine_similarity"]


def as_double_array(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (matches DuckDB's list arithmetic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|) — DuckDB's list_cosine_similarity formula."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
