"""Deterministic split/sample tests: key-pure assignment, engine
agreement (verified against python hashlib), stable proportions."""

from __future__ import annotations

import hashlib

from streaming_data_pipeline_azure_spark.operators.sampling import (
    deterministic_sample,
    train_test_split,
)


def test_split_matches_reference_hash(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    got = {
        r["k"]: r["split"]
        for r in train_test_split(df, "k", 0.25).collect()
    }
    for k in range(500):
        want = (
            "test"
            if hashlib.md5(str(k).encode()).hexdigest()[:8] < "40000000"
            else "train"
        )
        assert got[k] == want, k


def test_split_is_repartition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], ["k"])
    a = {r["k"]: r["split"] for r in train_test_split(df, "k", 0.1).collect()}
    b = {
        r["k"]: r["split"]
        for r in train_test_split(df.repartition(7), "k", 0.1).collect()
    }
    assert a == b


def test_sample_fraction_approximate(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], ["k"])
    n = deterministic_sample(df, "k", 0.2).count()
    assert 0.15 * 5000 <= n <= 0.25 * 5000
