"""Operator-internal persist bookkeeping.

Several operators persist an intermediate exactly because it feeds two or
three downstream branches of the same query (shingle sets feed signature
generation AND both verify-join branches; the range-partitioned packing
frame feeds the totals pass AND the final window). Spark never
auto-unpersists, so a long-lived session running many such queries (the
80+-query bench/driver loop) accumulates dead blocks in executor storage
memory (ADVICE r2).

The operator cannot unpersist before returning — its result is lazy and
the caller has not materialized it yet. So: operators register every
internal persist via :func:`persist_tracked`, and hosts with a query
boundary (bench.py, scripts/check_correctness.py, any service loop) call
:func:`release_caches` once the query's result is materialized. A host
that never calls it degrades to the old behavior, bounded by Spark's own
LRU block eviction — never wrong results, just wasted storage memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist (default MEMORY_AND_DISK level) and register the handle for
    the next :func:`release_caches` sweep."""
    out = df.persist()
    _LIVE.append(out)
    return out


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many were
    released. Call at query boundaries, after results are materialized."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
