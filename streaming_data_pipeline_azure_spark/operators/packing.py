"""Sequence packing for pretraining batches: assign documents to
fixed-token-capacity bins in a deterministic global order.

The core primitive is a *distributed prefix sum* — the thing a naive
implementation gets wrong at scale by funneling every row through one
``Window.orderBy`` partition. Here:

1. ``repartitionByRange(order_col)`` gives a total order across
   partitions (partition i's rows all precede partition i+1's);
2. each partition computes its LOCAL running sum with a window keyed on
   ``spark_partition_id()`` — parallel, no global shuffle;
3. per-partition totals (P rows, driver-tiny) become exclusive prefix
   offsets, rejoined by partition id via broadcast.

The resulting cumulative sum is a pure function of the data and the
total order — range boundary placement cannot change it — so results
are reproducible across cluster sizes and match a single-window oracle.

Packing itself is the "greedy boundary" approximation used by most
large-scale pipelines (docs in a fixed order, bin = exclusive-cumsum
div capacity): bins fill to >= capacity the moment they overflow, and a
doc longer than the capacity occupies its own bin(s) worth of budget.
First-fit-decreasing packs tighter but is inherently sequential; the
boundary scheme is fully data-parallel and deterministic, which is what
a 100 TB corpus run needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.functions.cache import persist_tracked


def with_global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str = "cum",
    n_ranges: int | None = None,
) -> DataFrame:
    """Inclusive prefix sum of ``value_col`` over the total order given by
    ``order_col`` (must be unique), computed without a single-partition
    window. Two jobs: one pass for per-partition totals, one for the
    final frame."""
    spark = df.sparkSession
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    n_ranges = n_ranges or spark.sparkContext.defaultParallelism
    ranged = df.withColumn("__val", value).repartitionByRange(
        n_ranges, F.col(order_col)
    ).withColumn("__pid", F.spark_partition_id())
    # totals pass + final pass read it once each; released by the host's
    # next release_caches() sweep (ADVICE r2: a bare persist accumulated
    # blocks across the 80+-query bench loop)
    ranged = persist_tracked(ranged)
    totals = (
        ranged.groupBy("__pid").agg(F.sum("__val").alias("__tot")).collect()
    )
    # exclusive prefix offsets over the P partition totals — O(P) driver
    # work, the only non-distributed step
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__tot"] or 0
    offmap = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("__pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ranged.withColumn(
            out_col, F.sum("__val").over(w) + offmap[F.col("__pid")]
        )
        .drop("__val", "__pid")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str | Column,
    capacity: int,
) -> DataFrame:
    """Assign each document a ``bin`` id such that consecutive documents
    (in ``id_col`` order) share a bin until its token budget overflows:
    ``bin = exclusive_cumsum(tokens) div capacity``."""
    cum = with_global_cumsum(df, id_col, token_col, out_col="__cum")
    tokens = F.col(token_col) if isinstance(token_col, str) else token_col
    return cum.withColumn(
        "bin",
        F.floor((F.col("__cum") - tokens) / F.lit(capacity)).cast("long"),
    ).drop("__cum")


def pack_stats(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-bin packing summary (docs, tokens, fill ratio vs capacity is
    the caller's division)."""
    return packed.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("total_tokens"),
    )


def pack_sequences_grouped(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    token_col: str | Column,
    capacity: int,
) -> DataFrame:
    """Pack WITHIN groups (r7): sequence packing that never mixes
    groups in a bin — the language/source-purity constraint a
    multilingual pretraining mix imposes (a bin is one training
    sequence; cross-language bins poison it). Same greedy
    consecutive-fill as :func:`pack_sequences`, but the prefix sum is
    a per-group window (PARTITION BY group ORDER BY id): with many
    groups this scales BETTER than the global two-pass prefix sum —
    each group sorts only its own rows on the one group-key shuffle —
    and needs no driver offsets at all. Bin identity is
    (group_cols…, bin); deterministic given unique ids."""
    w = Window.partitionBy(*group_cols).orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tokens = F.col(token_col) if isinstance(token_col, str) else token_col
    cum = F.sum(tokens).over(w)
    return df.withColumn(
        "bin",
        F.floor((cum - tokens) / F.lit(capacity)).cast("long"),
    )
