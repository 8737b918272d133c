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


def test_cap_per_group_limits_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        cap_per_group,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 80 else "small") for i in range(88)],
        "doc_id long, source string",
    )
    capped = cap_per_group(df, "source", "doc_id", 10)
    counts = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # the 80-row group is capped; the 8-row group keeps all rows
    assert counts == {"big": 10, "small": 8}
    ids1 = sorted(r["doc_id"] for r in capped.collect())
    ids2 = sorted(
        r["doc_id"] for r in cap_per_group(df, "source", "doc_id", 10).collect()
    )
    assert ids1 == ids2  # same survivors every run
    # survivors at k=5 nest inside survivors at k=10 (rank stability)
    ids5 = {r["doc_id"] for r in cap_per_group(df, "source", "doc_id", 5).collect()}
    assert ids5 <= set(ids1)
