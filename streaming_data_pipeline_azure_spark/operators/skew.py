"""Skew-resistant join and aggregation utilities (SURVEY.md §7 M5).

AQE's skew-join splitting covers sort-merge joins at runtime, and map-side
partial aggregation absorbs most group-by skew. The two gaps these
utilities close at 100 TB:

- :func:`salted_join` — equi-join where the probe side has hot keys and
  the build side is too large to broadcast: the big side gets a
  deterministic per-row salt in ``[0, n_salts)``, the small side is
  replicated ``n_salts`` times, and the join runs on ``(key, salt)`` so a
  hot key's rows spread over ``n_salts`` tasks instead of one straggler.
  Cost: small side shuffles ``n_salts`` copies — size it so
  ``|small| * n_salts`` stays well under the big side.
- :func:`salted_groupby_agg` — two-phase aggregation for decomposable
  aggregates when a single group dominates: phase 1 aggregates
  ``(keys, salt)`` (hot group split across tasks), phase 2 merges per
  key. With healthy map-side combine this is redundant; it exists for
  high-cardinality-accumulator cases (long strings, collect-ish state)
  where partial aggregation degrades.

Salts are ``pmod(xxhash64(whole row), n)`` — deterministic under retries
(a random salt would break exactly-once task re-execution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}

_PARTIALS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(n_salts))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Result is identical to ``big.join(small, on, how)`` for ``inner`` and
    ``left`` joins (each big row matches exactly its salt's replica)."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_s = big.withColumn("__salt", _row_salt(big, n_salts))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return big_s.join(small_s, keys + ["__salt"], how).drop("__salt")


def salted_groupby_agg(
    df: DataFrame,
    group_cols: list[str],
    metrics: dict[str, tuple[str, str]],
    *,
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase group-by for decomposable aggregates.

    ``metrics`` maps output name → ``(agg, col)`` with agg in
    sum/count/min/max. AVG composes as sum/count in the caller (keeping
    the decimal-accumulation discipline the engine uses for oracle
    determinism)."""
    bad = {a for a, _ in metrics.values()} - set(_PARTIALS)
    if bad:
        raise ValueError(f"non-decomposable aggregates: {sorted(bad)}")
    salted = df.withColumn("__salt", _row_salt(df, n_salts))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[
            _PARTIALS[agg](F.col(col)).alias(name)
            for name, (agg, col) in metrics.items()
        ]
    )
    return phase1.groupBy(*group_cols).agg(
        *[
            _MERGES[agg](F.col(name)).alias(name)
            for name, (agg, _) in metrics.items()
        ]
    )


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Shuffle-reduction join (r7): when the build side is SELECTIVE
    but too large to broadcast raw, both sides of a plain equi-join
    pay a full shuffle — most of the probe side's bytes traveling only
    to be dropped. This routes the build side's keys through the
    fixed-size distributed Bloom filter (``functions/bloom.py``): the
    bitmap broadcasts packed as one row of m_bits/64 longs
    (``bloom_filter_maybe_inline`` — the membership test is row-local
    codegen, so probe rows that cannot match drop BEFORE the exchange
    without themselves shuffling), and the exact join then runs on
    the survivors (false positives die there; false negatives don't
    exist, so the result EQUALS the plain join — oracle-checked).
    This is the runtime-filter / DPP-for-non-partition-keys pattern
    Spark applies only in narrow cases; here it is explicit and
    composable. Shuffle-record reduction is metrics-tested."""
    from streaming_data_pipeline_azure_spark.functions.bloom import (
        bloom_build,
        bloom_filter_maybe_inline,
    )

    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/semi joins only; "
            f"how={how!r} would silently drop unmatched probe rows "
            f"(the prefilter removes them before an outer join could "
            f"preserve them) — use a plain join for outer semantics"
        )
    bits = bloom_build(
        small.select(key), key, m_bits=m_bits, k_hashes=k_hashes
    )
    pre = bloom_filter_maybe_inline(
        big, key, bits, m_bits=m_bits, k_hashes=k_hashes
    )
    return pre.join(small, key, how)


def key_skew_report(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Join/agg KEY SKEW report: the ``top_k`` heaviest keys with
    their row shares plus the overall max∕mean concentration ratio —
    the numbers that decide whether a key needs salting
    (salted_join/salted_groupby_agg) or AQE skew handling before the
    shuffle melts one task. Returns top_k rows: (key rendered as
    string, n_rows, share_scaled, max_over_mean_scaled — the last
    repeated on every row for one-scan convenience).

    Exact counts; shares and the concentration ratio are floor-scaled
    integer DIVs (max∕mean = max·n_keys ∕ total). One count
    aggregation at key grain + a TakeOrderedAndProject top-k + a
    one-row broadcast of the totals."""
    per = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = per.agg(
        F.sum("n_rows").cast("long").alias("__total"),
        F.count(F.lit(1)).cast("long").alias("__nk"),
        F.max("n_rows").cast("long").alias("__mx"),
    )
    return (
        per.orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_k)
        .join(F.broadcast(tot))
        .select(
            "key",
            "n_rows",
            F.expr(
                f"CAST((n_rows * CAST({scale} AS BIGINT)) DIV __total"
                " AS BIGINT)"
            ).alias("share_scaled"),
            F.expr(
                f"CAST((CAST(__mx AS DECIMAL(38,0)) * __nk * {scale})"
                " DIV __total AS BIGINT)"
            ).alias("max_over_mean_scaled"),
        )
    )
