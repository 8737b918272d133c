"""Distributed Bloom filter as a bit-position table — the fixed-memory
membership sketch completing the family next to HLL++ (distinct), GK
(quantiles) and CMS (heavy hitters).

Representation: instead of a packed bitmap object, the filter is a
DataFrame of the DISTINCT SET BIT POSITIONS (``bit_pos`` BIGINT, at
most ``m_bits`` rows ≈ 9·min(m, k·n) bytes in parquet). That keeps
everything JVM-side and composable: building is one explode+distinct
over codegen ``xxhash64`` positions, membership is a broadcast join —
no Python, no UDF, no driver bitmap merge — and the table broadcasts
whenever m is sized sanely (2^22 bits → ≤4M rows ≈ tens of MB), which
is the whole point: a membership side TOO BIG TO BROADCAST RAW (e.g.
every n-gram of a large eval suite) collapses to a broadcastable
constant-size sketch.

Guarantees: NO false negatives (a present value always matches); false
positives at the textbook rate (1-e^(-kn/m))^k — callers that need
exactness follow with an exact verify on the (much smaller) candidate
set, as :func:`...operators.corpus.ngram_overlap_bloom` does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(
    col: Column | str, *, m_bits: int, k_hashes: int
) -> Column:
    """The k bit positions of a value: ``pmod(xxhash64(i, v), m)`` for
    i in 0..k-1 (seeding via a leading literal column — one codegen
    hash per position)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), c), F.lit(m_bits))
            for i in range(k_hashes)
        ]
    )


def bloom_build(
    df: DataFrame, col: str, *, m_bits: int, k_hashes: int
) -> DataFrame:
    """Build the filter over a column: one explode + distinct, output
    (bit_pos) with at most min(m_bits, k·n_distinct) rows."""
    return (
        df.select(
            F.explode(
                bloom_positions(col, m_bits=m_bits, k_hashes=k_hashes)
            ).alias("bit_pos")
        )
        .distinct()
    )


def bloom_filter_maybe(
    df: DataFrame, col: str, bits: DataFrame, *, m_bits: int, k_hashes: int
) -> DataFrame:
    """Rows of ``df`` whose ``col`` value is MAYBE in the filter (all k
    positions set) — a superset of the truly-present rows, never a
    subset. The bits table broadcasts; the candidate check runs on the
    distinct values, then semi-joins back."""
    vals = df.select(col).distinct()
    pos = vals.select(
        col,
        F.explode(
            bloom_positions(col, m_bits=m_bits, k_hashes=k_hashes)
        ).alias("bit_pos"),
    )
    hits = (
        pos.join(F.broadcast(bits), "bit_pos")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__nhit"))
        .filter(F.col("__nhit") == k_hashes)
        .select(col)
    )
    return df.join(hits, col, "semi")
