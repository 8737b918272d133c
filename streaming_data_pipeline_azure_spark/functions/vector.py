"""Vector math over ``array<float|double>`` columns — pure Catalyst
expressions (``zip_with`` / ``aggregate``), no Python in the hot path.

Element-order of accumulation is left-to-right inside a single row, so the
results are deterministic regardless of partitioning — these run inside
whole-stage codegen on every executor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Row-local dot product: sum(a[i]*b[i]) accumulated left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(|a|*|b|). Formula written exactly as
    dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))) so an oracle engine replicating
    the same expression gets bit-identical doubles.

    Zero-norm inputs return 0.0 (undefined angle → "not similar") instead
    of raising DIVIDE_BY_ZERO under ANSI mode — found by property testing
    with all-zero vectors."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def literal_vector(values: list[float]) -> Column:
    """A query vector as a literal array<double> column."""
    return F.array(*[F.lit(float(v)) for v in values])
