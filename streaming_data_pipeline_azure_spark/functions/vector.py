"""Vector math over ``array<float|double>`` columns — pure Catalyst
expressions, no Python in the hot path.

Element-order of accumulation is left-to-right inside a single row, so the
results are deterministic regardless of partitioning.

Two physical forms, SAME arithmetic (r13 optimization round, guide §4.1):

- the higher-order-function form (``aggregate``/``zip_with``) works for
  any runtime array length but is evaluated INTERPRETED — HOF lambdas are
  CodegenFallback, measured ~100× slower than codegen at high row counts
  (see ``similarity.MAX_LITERAL_CENTROIDS`` for the r11 measurement);
- with a statically known element count (``dim=``), the same fold is
  emitted as an unrolled expression chain ``0.0 + a[0]*b[0] + a[1]*b[1]
  + …`` — the identical multiply/add sequence on the identical operands
  (so bit-identical IEEE doubles; parity pinned in
  tests/test_vector_unroll.py), but it runs inside whole-stage codegen.

``dim`` is a caller CONTRACT that every array has exactly that length
(fixed-dim embedding columns, literal query vectors): for a shorter array
the unrolled form yields NULL (out-of-range ``getItem``) where the HOF
form would sum the shorter prefix. Pass ``dim`` only where the length is
structural.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Row-local dot product: sum(a[i]*b[i]) accumulated left-to-right.

    ``dim``: statically known array length → unrolled codegen form
    (bit-identical fold, see module docstring)."""
    if dim is not None:
        acc: Column = F.lit(0.0)
        for i in range(dim):
            acc = acc + a[i] * b[i]
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine_similarity(
    a: Column, b: Column, dim: int | None = None
) -> Column:
    """cos(a,b) = dot/(|a|*|b|). Formula written exactly as
    dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))) so an oracle engine replicating
    the same expression gets bit-identical doubles.

    Zero-norm inputs return 0.0 (undefined angle → "not similar") instead
    of raising DIVIDE_BY_ZERO under ANSI mode — found by property testing
    with all-zero vectors."""
    denom = norm(a, dim) * norm(b, dim)
    return F.when(denom > 0, dot(a, b, dim) / denom).otherwise(F.lit(0.0))


def literal_vector(values: list[float]) -> Column:
    """A query vector as a literal array<double> column."""
    return F.array(*[F.lit(float(v)) for v in values])
