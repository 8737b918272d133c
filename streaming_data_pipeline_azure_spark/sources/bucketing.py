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
