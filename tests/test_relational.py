"""Unit tests for F1/A1/A2/A3/T1 over tiny in-memory frames."""

from __future__ import annotations

import pytest

from streaming_data_pipeline_azure_spark.operators import relational

ROWS = [
    ("o1", "1", 100.0, "A", "Chicago"),
    ("o2", "2", 200.0, "B", "Chicago"),
    ("o3", "3", 50.0, "C", "Dallas"),
    ("o4", "4", 150.0, "D", "Dallas"),
    ("o5", "5", 400.0, "E", "Boston"),
]
COLS = ["order_id", "customer_id", "purchase_amount", "customer_name", "city"]


@pytest.fixture(scope="module")
def enriched(spark):
    return spark.createDataFrame(ROWS, COLS)


def test_filter_city(enriched):
    rows = relational.filter_by_city(enriched, "Chicago").collect()
    assert {r["order_id"] for r in rows} == {"o1", "o2"}


def test_avg_scalar(enriched):
    [row] = relational.avg_purchase(enriched, "Chicago").collect()
    assert row["avg_purchase"] == 150.0


def test_avg_scalar_unfiltered(enriched):
    [row] = relational.avg_purchase(enriched).collect()
    assert row["avg_purchase"] == 180.0


def test_avg_by_city(enriched):
    got = {
        r["city"]: r["avg_purchase"]
        for r in relational.avg_purchase_by_city(enriched).collect()
    }
    assert got == {"Chicago": 150.0, "Dallas": 100.0, "Boston": 400.0}


def test_sum_by_city(enriched):
    got = {
        r["city"]: r["total_purchase"]
        for r in relational.sum_purchase_by_city(enriched).collect()
    }
    assert got == {"Chicago": 300.0, "Dallas": 200.0, "Boston": 400.0}


def test_top_n(enriched):
    assert relational.top_n(enriched, 3).count() == 3
    rows = relational.top_n(enriched, 2, order_col="purchase_amount").collect()
    assert [r["order_id"] for r in rows] == ["o3", "o1"]


def test_unpivot_shape_and_values(spark):
    """melt: n_rows × n_metrics long rows, ids preserved, values cast
    double; column order (ids…, metric, value)."""
    from streaming_data_pipeline_azure_spark.operators.relational import (
        unpivot,
    )

    df = spark.createDataFrame(
        [("k1", 1, 10.5), ("k2", 2, 20.5)], "id string, a long, b double"
    )
    out = unpivot(df, ["id"], ["a", "b"], var_name="m", value_name="v")
    assert out.columns == ["id", "m", "v"]
    rows = {(r["id"], r["m"]): r["v"] for r in out.collect()}
    assert len(rows) == 4
    assert rows[("k1", "a")] == 1.0 and rows[("k2", "b")] == 20.5
