"""Golden-sample and plan tests for the flagship enrichment join (J1+P1).

The golden fixture reproduces the reference's portal "Test query with
sample data" (reference README.md:182, sample-orders.json + first 5 rows of
customers.csv — documented in FIXTURES.md §1-2): 5 orders with customerID
1..5 and amounts 182/33/170/170/470 joined against
1,Willis Collins,Dallas · 2,Casey Brady,Chicago · 3,Walker Wong,SanJose ·
4,Randall Weeks,SanDiego · 5,Gerardo Dorsey,Dallas.
"""

from __future__ import annotations

from pyspark.sql import Row

from streaming_data_pipeline_azure_spark.operators.enrich import (
    enrich_orders,
    with_document_id,
)
from streaming_data_pipeline_azure_spark.plans.inspect import (
    physical_plan,
)
from streaming_data_pipeline_azure_spark.schemas import (
    CUSTOMER_SCHEMA,
    ORDER_SCHEMA,
)

GOLDEN_ORDERS = [
    ("o-1", 1, 182),
    ("o-2", 2, 33),
    ("o-3", 3, 170),
    ("o-4", 4, 170),
    ("o-5", 5, 470),
]
GOLDEN_CUSTOMERS = [
    (1, "Willis Collins", "Dallas"),
    (2, "Casey Brady", "Chicago"),
    (3, "Walker Wong", "SanJose"),
    (4, "Randall Weeks", "SanDiego"),
    (5, "Gerardo Dorsey", "Dallas"),
]


def _golden(spark):
    orders = spark.createDataFrame(GOLDEN_ORDERS, ORDER_SCHEMA)
    customers = spark.createDataFrame(GOLDEN_CUSTOMERS, CUSTOMER_SCHEMA)
    return enrich_orders(orders, customers)


def test_golden_sample_join(spark):
    out = {r["order_id"]: r for r in _golden(spark).collect()}
    assert len(out) == 5
    assert out["o-1"]["customer_name"] == "Willis Collins"
    assert out["o-1"]["city"] == "Dallas"
    assert out["o-1"]["purchase_amount"] == 182
    assert out["o-2"]["city"] == "Chicago"
    assert out["o-5"]["customer_name"] == "Gerardo Dorsey"
    # sink type coercion (reference README.md:114): customer_id is a string
    assert out["o-3"]["customer_id"] == "3"
    assert isinstance(out["o-3"]["customer_id"], str)


def test_inner_join_drops_unmatched(spark):
    orders = spark.createDataFrame(
        GOLDEN_ORDERS + [("o-x", 99, 10)], ORDER_SCHEMA
    )
    customers = spark.createDataFrame(GOLDEN_CUSTOMERS, CUSTOMER_SCHEMA)
    assert enrich_orders(orders, customers).count() == 5


def test_document_id_is_unique(spark):
    docs = with_document_id(_golden(spark)).collect()
    ids = {r["id"] for r in docs}
    assert len(ids) == 5
    assert all(len(i) == 36 for i in ids)  # uuid text


def test_join_is_broadcast(spark, sf_dir):
    """The stream side must never shuffle for this join at 100 TB —
    the customer snapshot broadcasts (ASA's reference-data model)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = enrich_orders(
        orders, customer,
        order_id_col="o_orderkey", customer_fk_col="o_custkey",
        amount_col="o_totalprice", customer_pk_col="c_custkey",
        customer_name_col="c_name", city_col="c_mktsegment",
    )
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
