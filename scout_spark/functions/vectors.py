"""Vector math over array<float|double> embedding columns.

Built from higher-order functions (zip_with + aggregate) so the hot path
stays JVM-side — no Python crossing for dot products at 100 TB scale.
Math is done in double regardless of the storage type (array<float>) so
results match a double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Σ a_i * b_i via zip_with + aggregate (no shuffle, no UDF)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a|*|b|); NULL-safe on zero vectors via try_divide."""
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))
