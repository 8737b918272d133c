"""J1 + P1 + K1 coercion — the flagship stream-to-reference enrichment join.

Reference semantics (README.md:166-170, the entire ASA query):

    SELECT o.orderID as order_id, o.customerID as customer_id,
           c.cust_name as customer_name, c.city as city,
           o.amount as purchase_amount
    INTO [enriched-orders] FROM orders o
    JOIN customers c ON o.customerID = c.cust_id

ASA reference-data joins replicate the bounded side to every node and join
unwindowed — the exact analogue of a Spark **broadcast hash join** of a
static DataFrame against the stream. We pin ``F.broadcast`` on the customer
side so the plan never degrades to a shuffle at scale: the reference table
is 10k rows (README.md:81) and stays far under executor memory, while the
stream side at 100 TB must never shuffle for this join.

``customer_id`` is cast to string to preserve the sink coercion observed at
reference README.md:114 ("customer_id": "8512" despite int on the wire).

This function is stream/batch agnostic: pass a streaming DataFrame and the
result is an unbounded enriched stream (stream-static joins need no
watermark — reference README has no event-time field at all, see
orders-generator/main.go:104-108); pass a batch DataFrame and it is an
ordinary Catalyst-planned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_orders(
    orders: DataFrame,
    customers: DataFrame,
    *,
    order_id_col: str = "orderID",
    customer_fk_col: str = "customerID",
    amount_col: str = "amount",
    customer_pk_col: str = "cust_id",
    customer_name_col: str = "cust_name",
    city_col: str = "city",
    broadcast_customers: bool = True,
) -> DataFrame:
    """Inner equi-join of an order stream/table against the customer
    reference table, projected to the reference's sink document shape.

    Inner semantics: orders with no matching customer are silently dropped,
    exactly as ASA's reference-data join does (SURVEY.md §2.1 J1).
    """
    dim = F.broadcast(customers) if broadcast_customers else customers
    joined = orders.join(
        dim, orders[customer_fk_col] == dim[customer_pk_col], "inner"
    )
    return joined.select(
        F.col(order_id_col).cast("string").alias("order_id"),
        F.col(customer_fk_col).cast("string").alias("customer_id"),
        F.col(amount_col).alias("purchase_amount"),
        F.col(customer_name_col).alias("customer_name"),
        F.col(city_col).alias("city"),
    )


def with_document_id(enriched: DataFrame) -> DataFrame:
    """Append the Cosmos-style auto GUID ``id`` (reference README.md:118).

    Kept separate from :func:`enrich_orders` because ``uuid()`` is
    nondeterministic and must stay out of any value-hash-checked output.
    """
    return enriched.withColumn("id", F.expr("uuid()"))
