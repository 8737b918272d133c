"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Operator keys map to SURVEY.md §2 inventory rows. Testdata column mapping
(FIXTURES.md §4): orderID→o_orderkey, customerID→o_custkey=c_custkey,
amount→o_totalprice, cust_name→c_name, city→c_mktsegment.

Numeric determinism: every double aggregate goes through an exact
DECIMAL(18,4) accumulation and only then is cast to double, so Spark and
DuckDB produce bit-identical values regardless of partial-aggregation
order (double addition is not associative; decimal addition is).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators import enrich, relational

SF0001 = "/root/testdata/sf0.001"

# The reference's 14 cities are stood in for by c_mktsegment (FIXTURES.md §4);
# "BUILDING" plays the role of "Chicago" in F1/A1.
FILTER_CITY = "BUILDING"


def _tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]


def _enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = _tables(spark, sf_dir, "orders", "customer")
    return enrich.enrich_orders(
        orders,
        customer,
        order_id_col="o_orderkey",
        customer_fk_col="o_custkey",
        amount_col="o_totalprice",
        customer_pk_col="c_custkey",
        customer_name_col="c_name",
        city_col="c_mktsegment",
    )


_ENRICHED_ORACLE = """
    SELECT CAST(o.o_orderkey AS VARCHAR) AS order_id,
           CAST(o.o_custkey AS VARCHAR) AS customer_id,
           o.o_totalprice AS purchase_amount,
           c.c_name AS customer_name,
           c.c_mktsegment AS city
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship J1+P1 enrichment join on sf0.001 (driver checks rows>0)."""
    return _enriched(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # ---- core surface (SURVEY.md §2.1) ----
        "enriched_orders": _enriched,
        "filter_city": lambda spark, sf: relational.filter_by_city(
            _enriched(spark, sf), FILTER_CITY
        ),
        "avg_purchase_scalar": lambda spark, sf: relational.avg_purchase(
            _enriched(spark, sf), FILTER_CITY
        ),
        "avg_purchase_by_city": lambda spark, sf: relational.avg_purchase_by_city(
            _enriched(spark, sf)
        ),
        "sum_purchase_by_city": lambda spark, sf: relational.sum_purchase_by_city(
            _enriched(spark, sf)
        ),
        "top_customers": lambda spark, sf: relational.top_n(
            _tables(spark, sf, "customer")[0], 10, order_col="c_custkey"
        ),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "enriched_orders": _ENRICHED_ORACLE,
        "filter_city": f"""
            SELECT * FROM ({_ENRICHED_ORACLE}) WHERE city = '{FILTER_CITY}'
        """,
        "avg_purchase_scalar": f"""
            SELECT CAST(SUM(CAST(purchase_amount AS DECIMAL(18,4))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_purchase
            FROM ({_ENRICHED_ORACLE}) WHERE city = '{FILTER_CITY}'
        """,
        "avg_purchase_by_city": f"""
            SELECT city,
                   CAST(SUM(CAST(purchase_amount AS DECIMAL(18,4))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_purchase
            FROM ({_ENRICHED_ORACLE}) GROUP BY city
        """,
        "sum_purchase_by_city": f"""
            SELECT city,
                   CAST(SUM(CAST(purchase_amount AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_purchase
            FROM ({_ENRICHED_ORACLE}) GROUP BY city
        """,
        "top_customers": """
            SELECT * FROM customer ORDER BY c_custkey LIMIT 10
        """,
    }
