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

from streaming_data_pipeline_azure_spark.functions.localdf import local_rows_df


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


def bloom_filter_maybe_inline(
    df: DataFrame, col: str, bits: DataFrame, *, m_bits: int, k_hashes: int
) -> DataFrame:
    """Row-local membership check — the ZERO-SHUFFLE form of
    :func:`bloom_filter_maybe` (r7). That function routes the probe
    side through ``distinct`` + semi-join, which shuffles the probe's
    whole key column; fine for re-joining pipelines, but useless as a
    PRE-shuffle filter. Here the bit table packs into ``m_bits/64``
    longs on the driver (inherently bounded: the collect is ≤ m_bits
    rows and the bitmap is m_bits/8 bytes — 128 KB at the default 2^20;
    a guard rejects m_bits > 2^24), ships as a ONE-ROW broadcast, and
    every row evaluates k shift-and-mask tests as pure codegen — probe
    rows never move. Same guarantee: a superset of the truly-present
    rows, never a subset."""
    if m_bits > (1 << 24):
        raise ValueError(
            f"bloom_filter_maybe_inline packs m_bits/8 bytes on the "
            f"driver; m_bits={m_bits} exceeds the 2^24 cap — use "
            f"bloom_filter_maybe (bit-position table) instead"
        )
    n_words = (m_bits + 63) // 64
    words = [0] * n_words
    for r in bits.collect():  # <= m_bits rows by construction
        p = int(r["bit_pos"])
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement fold back into int64 for the literal array
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    spark = df.sparkSession
    wdf = local_rows_df(spark, [(words,)], "__bloom_words array<bigint>")
    pos = bloom_positions(col, m_bits=m_bits, k_hashes=k_hashes)
    checks = [
        F.getbit(
            F.element_at(
                F.col("__bloom_words"),
                (F.element_at(pos, i + 1) / 64).cast("int") + 1,
            ),
            F.pmod(F.element_at(pos, i + 1), F.lit(64)),
        )
        == 1
        for i in range(k_hashes)
    ]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return (
        df.crossJoin(F.broadcast(wdf)).filter(cond).drop("__bloom_words")
    )
