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


def test_sqrt_temperature_sample_rebalances_domains(spark):
    """alpha=0.5 mixing: the smallest domain keeps rate 1.0 (all rows);
    a domain 16x larger keeps ~1/4 of its rows; the kept set is a pure
    function of (id, domain counts) — rerun-identical."""
    from streaming_data_pipeline_azure_spark.operators.sampling import (
        sqrt_temperature_rates,
        sqrt_temperature_sample,
    )

    rows = [(i, "big") for i in range(1600)] + [
        (10000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    rates = {r["lang"]: r["keep_rate"]
             for r in sqrt_temperature_rates(df, "lang").collect()}
    assert rates["small"] == 1.0
    assert rates["big"] == 0.25  # sqrt(100/1600)

    kept1 = {r["doc_id"] for r in sqrt_temperature_sample(df, "doc_id", "lang").collect()}
    kept2 = {r["doc_id"] for r in sqrt_temperature_sample(df, "doc_id", "lang").collect()}
    assert kept1 == kept2  # deterministic
    n_small = sum(1 for k in kept1 if k >= 10000)
    n_big = len(kept1) - n_small
    assert n_small == 100          # smallest domain intact
    assert 300 <= n_big <= 500     # ~0.25 * 1600 under the Knuth uniform


def test_assign_shards_deterministic_and_spread(spark):
    from streaming_data_pipeline_azure_spark.operators.sampling import (
        assign_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(4000)], ["doc_id"])
    a = {r["doc_id"]: r["shard"] for r in assign_shards(df, "doc_id", 8).collect()}
    b = {r["doc_id"]: r["shard"] for r in assign_shards(df, "doc_id", 8).collect()}
    assert a == b
    assert set(a.values()) == set(range(8))
    from collections import Counter
    sizes = Counter(a.values())
    # contiguous ids scatter near-uniformly: every shard within 25% of ideal
    assert all(abs(s - 500) < 125 for s in sizes.values()), sizes
