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


def test_pack_sequences_grouped_never_mixes_groups(spark):
    """Group-pure packing contract (same start-offset semantics as the
    global pack_sequences: a doc's bin is the bin of its START offset
    in the group's concatenated token stream): every group restarts at
    bin 0 — never mixes with another group — and a group's stream
    crossing the capacity boundary opens its next bin; result is
    partition-invariant."""
    from streaming_data_pipeline_azure_spark.operators.packing import (
        pack_sequences_grouped,
    )

    rows = [
        # en offsets: 0, 60, 110 -> bins 0, 0, 1
        ("en", 1, 60), ("en", 2, 50), ("en", 3, 10),
        # fr offsets: 0, 90, 180 -> bins 0, 0, 1 (fresh stream!)
        ("fr", 4, 90), ("fr", 5, 90), ("fr", 7, 10),
        ("de", 6, 5),
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, tok long")
    for parts in (1, 5):
        got = {
            r["doc_id"]: (r["lang"], r["bin"])
            for r in pack_sequences_grouped(
                df.repartition(parts), ["lang"], "doc_id", "tok", 100
            ).collect()
        }
        assert got[1] == ("en", 0) and got[2] == ("en", 0)
        assert got[3] == ("en", 1)
        assert got[4] == ("fr", 0) and got[5] == ("fr", 0)
        assert got[7] == ("fr", 1)
        assert got[6] == ("de", 0)
