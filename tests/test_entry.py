"""Smoke tests for the driver contract itself."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "order_id",
        "customer_id",
        "purchase_amount",
        "customer_name",
        "city",
    ]


def test_every_query_runs_and_oracle_keys_subset(spark, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
