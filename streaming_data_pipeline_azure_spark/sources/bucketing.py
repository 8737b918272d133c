"""Bucketed table layout for co-located, shuffle-free joins.

At 100 TB the dominant cost of a fact-to-fact join (lineitem ⋈ orders) is
shuffling both sides on the join key. Writing both tables bucketed by that
key with the same bucket count makes the join a per-bucket merge: Spark
reads matching buckets and plans SortMergeJoin with NO Exchange on either
side — the shuffle happened once at write time and is amortized over every
subsequent join.

Notes that matter in production:
- bucket counts must match (or divide evenly) across join partners;
- ``spark.sql.sources.bucketing.enabled`` is on by default; AQE leaves
  bucketed joins alone (no runtime coalescing of bucket partitions);
- bucketed tables go through the session catalog (``saveAsTable``) — the
  files are plain parquet plus bucket metadata in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets lets SortMergeJoin skip its sort stage
    entirely — the join becomes a streaming merge of pre-sorted files."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str],
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout: equality/IN predicates on
    ``partition_cols`` prune whole directories at plan time
    (PartitionFilters — zero bytes read for excluded partitions), and
    ``sort_within`` orders rows inside each file so min/max row-group
    stats prune within the survivors.

    ``repartition(partition_cols)`` first: without it every task writes a
    fragment into every partition directory (tasks × partitions small
    files — the classic small-file problem at scale)."""
    out = df.repartition(*[df[c] for c in partition_cols])
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def zorder_key(cols, mins, maxs, *, bits: int = 16):
    """Morton (Z-order) key over numeric columns: each value is scaled
    to a ``bits``-bit integer on its [min, max] range and the bits are
    interleaved — points close in the key are close in EVERY dimension,
    which is what makes multi-column min/max file skipping work.

    Pure codegen integer expression (bits × dims shift/mask terms); the
    min/max scaling is deliberately rank-free — no global sort to build
    the key. Heavily skewed columns compress into few distinct coords
    (documented trade-off; the range partitioner's sampling still
    spreads rows, but skipping selectivity degrades on the skewed
    dimension).

    Bit budget: the interleaved key must fit the 63 value bits of a
    signed long — at the default 16 bits, 4+ columns would push the top
    bit into the sign bit (negative keys sort before positive, breaking
    the clustering) and 5+ columns would silently wrap ``shiftleft``.
    ``bits`` is therefore auto-reduced to ``63 // dims`` when the
    requested ``bits * dims`` exceeds 63 (e.g. 4-D → 15 bits/dim,
    6-D → 10), keeping every dimension at equal, maximal resolution
    inside the budget (ADVICE r5)."""
    from pyspark.sql import functions as F

    dims = len(cols)
    if dims == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * dims > 63:
        bits = 63 // dims
        if bits < 1:
            raise ValueError(
                f"zorder_key: {dims} dimensions cannot fit a 63-bit key"
            )
    max_coord = (1 << bits) - 1
    coords = []
    for c, lo, hi in zip(cols, mins, maxs):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span <= 0:
            coords.append(F.lit(0).cast("long"))
        else:
            scaled = (
                (col.cast("double") - F.lit(float(lo)))
                / F.lit(span)
                * F.lit(float(max_coord))
            )
            coords.append(
                F.least(
                    F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
                    F.lit(max_coord),
                )
            )
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for d, coord in enumerate(coords):
            z = z + F.shiftleft(
                F.shiftright(coord, bit).bitwiseAND(F.lit(1)),
                bit * dims + d,
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout (the OPTIMIZE ZORDER BY shape):
    rows are range-partitioned and sorted by their Morton key, so every
    file covers a compact hyper-rectangle and parquet min/max stats
    prune files for predicates on ANY of ``zorder_cols`` — unlike a
    linear sort, which skips only on the leading column.

    Cost: one O(1)-row min/max aggregate + one range shuffle (sampled,
    no global sort); the key itself is codegen. Numeric columns only.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"__lo_{i}") for i, c in enumerate(zorder_cols)],
        *[F.max(c).alias(f"__hi_{i}") for i, c in enumerate(zorder_cols)],
    ).collect()[0]
    mins = [stats[f"__lo_{i}"] for i in range(len(zorder_cols))]
    maxs = [stats[f"__hi_{i}"] for i in range(len(zorder_cols))]
    z = zorder_key(zorder_cols, mins, maxs)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_sized_files(
    df: DataFrame,
    path: str,
    *,
    target_file_mb: int = 128,
    sample_rows: int = 10_000,
    mode: str = "overwrite",
) -> int:
    """Export writer that solves the small-files problem from the other
    direction: pick the partition count so output files land near
    ``target_file_mb`` COMPRESSED. Catalyst's logical size estimate is
    pre-compression (often 5-10× off for parquet), so this measures
    reality instead: a bounded sample is written to a scratch dir, its
    on-disk bytes/row scale up to the full row count, and the frame
    repartitions to ceil(total / target) before the real write.

    Costs one count + one sample write (both bounded) — worth it for a
    one-time export whose file sizing is consumed by every downstream
    reader forever. Returns the partition count used."""
    import math
    import shutil
    import tempfile

    n_rows = df.count()
    if n_rows == 0:
        df.coalesce(1).write.mode(mode).parquet(path)
        return 1
    scratch = tempfile.mkdtemp(prefix="sized_sample_")
    try:
        sample = df.limit(min(sample_rows, n_rows))
        sample.coalesce(1).write.mode("overwrite").parquet(f"{scratch}/s")
        import glob
        import os

        n_sampled = min(sample_rows, n_rows)
        sample_bytes = sum(
            os.path.getsize(f)
            for f in glob.glob(f"{scratch}/s/part-*.parquet")
        )
        bytes_per_row = max(sample_bytes / n_sampled, 1e-6)
        n_files = max(
            1,
            math.ceil(n_rows * bytes_per_row / (target_file_mb * 1024 * 1024)),
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    df.repartition(n_files).write.mode(mode).parquet(path)
    return n_files


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    *,
    n_files: int = 0,
    mode: str = "overwrite",
) -> None:
    """Globally ordered export (r7): the layout for curriculum-ordered
    training data and for downstream merge-readers — file k's key range
    ends before file k+1's begins, and rows inside each file are
    sorted. Complements :func:`write_zordered` (multi-column locality)
    with TOTAL single-axis order.

    Two-step, never a global single-node sort: ``repartitionByRange``
    samples the sort key to build balanced range boundaries (one extra
    sampling pass — the price of balance) and hash-free range-shuffles
    the rows; ``sortWithinPartitions`` then sorts each range locally.
    That is exactly Spark's distributed sort, made explicit so the
    write inherits it file-by-file. Parquet min/max stats per file
    give readers range pruning on the sort axis for free.

    ``n_files=0`` keeps the session's shuffle parallelism (one file
    per range partition)."""
    if not sort_cols:
        raise ValueError("write_range_sorted needs at least one sort column")
    out = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files > 0
        else df.repartitionByRange(*sort_cols)
    )
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
