"""S3 executed for real: JDBC reference-table scan against an embedded
Apache Derby database (the Derby jars ship with the Spark distribution,
so this is a genuine in-JVM JDBC round trip — DriverManager DDL writes,
Spark ``format("jdbc")`` reads).

Mirrors the reference's ``Crm.Customers`` table (README.md:57-105) and
the ASA periodic reference-data re-snapshot semantics (SURVEY.md §4.3):
the per-batch test mutates the dimension between micro-batches through a
second JDBC connection — an external CRM writer — and asserts batch N+1
enriches with the updated row.
"""

from __future__ import annotations

import json

import pytest

from streaming_data_pipeline_azure_spark.sources.registry import (
    read_jdbc,
    read_jdbc_customers,
    read_order_file_stream,
)
from streaming_data_pipeline_azure_spark.sources.sinks import ParquetUpsertSink
from streaming_data_pipeline_azure_spark.streaming.pipeline import (
    build_enrichment_query,
    run_to_completion,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _execute(spark, url: str, *statements: str) -> None:
    """Run DDL/DML through a plain JDBC connection in the Spark JVM."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for sql in statements:
            st.execute(sql)
        st.close()
    finally:
        conn.close()


@pytest.fixture()
def derby_url(spark, tmp_path):
    # keep derby.log out of the repo root; must be set before engine boot
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/crm;create=true"
    _execute(
        spark,
        url,
        "CREATE TABLE Customers ("
        " customerID INT PRIMARY KEY,"
        " customerName VARCHAR(64),"
        " city VARCHAR(64))",
        "INSERT INTO Customers VALUES"
        " (1,'Willis Collins','Dallas'),"
        " (2,'Casey Brady','Chicago'),"
        " (3,'Walker Wong','SanJose')",
    )
    return url


def test_jdbc_scan_roundtrip(spark, derby_url):
    df = read_jdbc(spark, derby_url, "Customers", driver=DERBY_DRIVER)
    rows = sorted((r[0], r[1], r[2]) for r in df.collect())
    assert rows == [
        (1, "Willis Collins", "Dallas"),
        (2, "Casey Brady", "Chicago"),
        (3, "Walker Wong", "SanJose"),
    ]


def test_jdbc_partitioned_scan(spark, derby_url):
    """The partition_column path must issue parallel range queries (one
    JDBC cursor per partition) and still return every row exactly once."""
    df = read_jdbc(
        spark,
        derby_url,
        "Customers",
        partition_column="customerID",
        num_partitions=3,
        lower_bound=1,
        upper_bound=4,
        driver=DERBY_DRIVER,
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 3


def test_jdbc_customers_normalized(spark, derby_url):
    """Derby upper-cases identifiers; the customers reader must still
    deliver CUSTOMER_SCHEMA names/types."""
    df = read_jdbc_customers(spark, derby_url, "Customers", driver=DERBY_DRIVER)
    assert df.columns == ["cust_id", "cust_name", "city"]
    assert dict((r["cust_id"], r["city"]) for r in df.collect()) == {
        1: "Dallas", 2: "Chicago", 3: "SanJose",
    }


def test_per_batch_refresh_sees_jdbc_mutation(spark, tmp_path, derby_url):
    """SURVEY §4.3 hard part, executed against a live mutating JDBC
    table: an 'external CRM writer' updates a dimension row between
    micro-batches, and per_batch refresh makes the next batch join the
    new value while the earlier batch keeps the old one."""
    src = tmp_path / "orders_in"
    src.mkdir()

    def loader():
        return read_jdbc_customers(
            spark, derby_url, "Customers", driver=DERBY_DRIVER
        )

    sink = ParquetUpsertSink(str(tmp_path / "sink"))

    def drain():
        # same checkpoint both runs → run 2 processes only the new file
        q = build_enrichment_query(
            read_order_file_stream(spark, str(src)),
            loader,
            sink,
            str(tmp_path / "ckpt"),
            refresh="per_batch",
            trigger_available_now=True,
        )
        run_to_completion(q)

    (src / "batch0.json").write_text(
        json.dumps({"orderID": "o0", "customerID": 1, "amount": 10})
    )
    drain()
    # external CRM writer updates the dimension between micro-batches
    _execute(
        spark,
        derby_url,
        "UPDATE Customers SET city = 'Austin' WHERE customerID = 1",
    )
    (src / "batch1.json").write_text(
        json.dumps({"orderID": "o1", "customerID": 1, "amount": 11})
    )
    drain()
    cities = {r["order_id"]: r["city"] for r in sink.read(spark).collect()}
    assert cities == {"o0": "Dallas", "o1": "Austin"}
