"""Source-registry tests: format round trips and dispatch (S4 + the
format surface a lake user expects). Kafka/Avro remain declarative-only
in this container (no connector jars) and are covered by builder tests
in test_streaming.py; JDBC runs for real in test_jdbc.py."""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_pipeline_azure_spark.plans.inspect import physical_plan
from streaming_data_pipeline_azure_spark.sources import registry

ROWS = [(1, "Willis Collins", "Dallas"), (2, "Casey Brady", "Chicago")]
SCHEMA = T.StructType(
    [
        T.StructField("cust_id", T.IntegerType(), False),
        T.StructField("cust_name", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
    ]
)


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    df.write.mode("overwrite").csv(str(tmp_path / "c"))
    back = registry.read_csv(spark, str(tmp_path / "c"), schema=SCHEMA)
    # CSV scans mark everything nullable; names/types must survive exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in SCHEMA.fields
    ]
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    df.write.mode("overwrite").json(str(tmp_path / "j"))
    back = registry.read_json(spark, str(tmp_path / "j"), schema=SCHEMA)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC must round-trip and give the same scan-level filter pushdown +
    column pruning as parquet — the property the engine's scale story
    rests on for any columnar source."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    df.write.mode("overwrite").orc(str(tmp_path / "o"))
    back = registry.read_orc(spark, str(tmp_path / "o"))
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)
    plan = physical_plan(
        back.filter(F.col("city") == "Dallas").select("cust_id")
    )
    assert re.search(r"PushedFilters:.*city", plan), plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "cust_name" not in m.group(1), plan


def test_read_source_dispatch(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    df.write.mode("overwrite").parquet(str(tmp_path / "p"))
    back = registry.read_source("parquet", spark, path=str(tmp_path / "p"))
    assert back.count() == 2
