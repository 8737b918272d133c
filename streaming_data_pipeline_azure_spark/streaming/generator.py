"""G1 — synthetic order-event generator, the Spark analogue of the
reference's Go producer (orders-generator/main.go:74-98):

- orderID: fresh UUID text (main.go:83)
- customerID: uniform 1..10000 (main.go:82)
- amount: uniform 20..499 (main.go:84)
- 1 event / 3 s in the reference (main.go:95) — here ``rows_per_second``
  is a knob because the generator's job in this repo is load generation
  for BENCH, not a demo trickle.

Built on the ``rate`` source so it scales: each micro-batch is produced
partition-parallel on executors, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def order_columns(df: DataFrame, n_customers: int = 10_000) -> DataFrame:
    """Map any driving frame onto the order schema."""
    return df.select(
        F.expr("uuid()").alias("orderID"),
        (F.floor(F.rand() * n_customers) + 1).cast("int").alias("customerID"),
        (F.floor(F.rand() * 480) + 20).cast("int").alias("amount"),
    )


def order_stream(
    spark: SparkSession, rows_per_second: int = 1000, n_customers: int = 10_000
) -> DataFrame:
    """Unbounded generated order stream (rate source → order schema)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return order_columns(rate, n_customers)


def order_batch(
    spark: SparkSession, n_rows: int, n_customers: int = 10_000, partitions: int | None = None
) -> DataFrame:
    """Bounded generated order table (for benchmarks)."""
    rng = spark.range(n_rows, numPartitions=partitions)
    return order_columns(rng, n_customers)


def to_kafka_payload(orders: DataFrame) -> DataFrame:
    """Serialize to the wire shape the reference produces: key = orderID,
    value = JSON bytes (main.go:86-88)."""
    return orders.select(
        F.col("orderID").alias("key"),
        F.to_json(F.struct("orderID", "customerID", "amount")).alias("value"),
    )
