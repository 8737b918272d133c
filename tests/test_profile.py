"""Tests for table profiling and sketch summaries."""

from __future__ import annotations

from streaming_data_pipeline_azure_spark.operators.profile import (
    numeric_summary,
    profile_columns,
    value_sketches,
)


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id int, s string"
    )
    out = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert out["id"]["n_rows"] == 4
    assert out["id"]["n_nulls"] == 0
    assert out["id"]["n_distinct"] == 4
    assert out["s"]["n_nulls"] == 1
    assert out["s"]["n_distinct"] == 2


def test_profile_single_scan(spark):
    """The profile must be one aggregation job, not one per column."""
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    plan = profile_columns(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2  # expand for distinct, no per-col jobs


def test_numeric_summary(spark):
    df = spark.createDataFrame([(1.0,), (3.0,), (None,)], "x double")
    [r] = numeric_summary(df, ["x"]).collect()
    assert (r["min_value"], r["max_value"], r["mean_value"]) == (1.0, 3.0, 2.0)


def test_value_sketches_shapes(spark, sf_dir):
    import pyspark.sql.functions as F

    ev = spark.createDataFrame(
        [(i, "t", float(i % 10), i % 7) for i in range(100)],
        "event_id int, event_type string, value double, user_id int",
    )
    [r] = value_sketches(ev, "event_type", "value", "user_id").collect()
    assert r["approx_distinct"] == 7  # HLL exact at tiny cardinality
    p50, p95 = r["approx_percentiles"]
    assert 3.0 <= p50 <= 6.0
    assert p95 >= 8.0
