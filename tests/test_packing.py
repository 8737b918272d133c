"""Sequence-packing tests: the distributed prefix sum must equal the
single-window definition regardless of range partitioning, and the
greedy-boundary bin assignment must respect capacity semantics."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators import packing


def test_global_cumsum_matches_single_window(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long")
    # force several range partitions so cross-partition offsets matter
    got = {
        r["id"]: r["cum"]
        for r in packing.with_global_cumsum(
            df, "id", "v", n_ranges=7
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_pack_sequences_capacity_semantics(spark):
    # tokens: 300, 300, 300, 700, 100 with capacity 512
    # exclusive cumsum: 0, 300, 600, 900, 1600 -> bins 0, 0, 1, 1, 3
    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 300), (4, 700), (5, 100)],
        "doc_id long, n_tokens long",
    )
    packed = {
        r["doc_id"]: r["bin"]
        for r in packing.pack_sequences(
            df, "doc_id", "n_tokens", capacity=512
        ).collect()
    }
    assert packed == {1: 0, 2: 0, 3: 1, 4: 1, 5: 3}
    stats = {
        r["bin"]: (r["n_docs"], r["total_tokens"])
        for r in packing.pack_stats(
            packing.pack_sequences(df, "doc_id", "n_tokens", capacity=512),
            "n_tokens",
        ).collect()
    }
    assert stats == {0: (2, 600), 1: (2, 1000), 3: (1, 100)}


def test_cumsum_independent_of_partition_count(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "id long, v long"
    )
    a = {
        r["id"]: r["cum"]
        for r in packing.with_global_cumsum(df, "id", "v", n_ranges=1).collect()
    }
    b = {
        r["id"]: r["cum"]
        for r in packing.with_global_cumsum(df, "id", "v", n_ranges=13).collect()
    }
    assert a == b


def test_persist_tracker_releases_blocks(spark, sf_dir):
    """Operators register internal persists; release_caches() unpersists
    them all (ADVICE r2: bare persists accumulated blocks across the
    bench loop)."""
    from streaming_data_pipeline_azure_spark.functions import cache as c
    from streaming_data_pipeline_azure_spark.operators.packing import (
        pack_sequences,
    )

    c.release_caches()  # drain anything earlier tests left behind
    docs = spark.range(100).selectExpr("id AS doc_id", "id % 7 + 1 AS toks")
    pack_sequences(docs, "doc_id", "toks", capacity=50).collect()
    assert len(c._LIVE) >= 1
    tracked = list(c._LIVE)
    released = c.release_caches()
    assert released == len(tracked)
    assert not c._LIVE
    for df in tracked:
        assert not df.storageLevel.useMemory and not df.storageLevel.useDisk
