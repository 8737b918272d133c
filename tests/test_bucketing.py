"""Bucketed-join layout test: two tables bucketed on the join key must
join with NO shuffle exchange on either side — the write-time bucketing
replaces the per-query shuffle (the core 100 TB fact-join strategy)."""

from __future__ import annotations

import re

from streaming_data_pipeline_azure_spark.plans.inspect import physical_plan
from streaming_data_pipeline_azure_spark.sources.bucketing import (
    read_table,
    write_bucketed,
)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "b_orders", bucket_col="o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", bucket_col="l_orderkey", n_buckets=8)
    # at sf0.01 the dimension fits the broadcast threshold, which would
    # bypass the bucketed-SMJ path this test pins; disable it (at real
    # fact-to-fact scale neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan, plan
        # the whole point: no shuffle before the join on either side
        assert not re.search(r"Exchange hashpartitioning", plan), plan
        # sanity: results match the plain (unbucketed) join
        pl = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        po = spark.read.parquet(f"{sf_dir}/orders.parquet")
        plain = pl.join(po, pl.l_orderkey == po.o_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_layout_prunes_directories(spark, sf_dir, tmp_path):
    """An equality filter on the partition column must become a
    PartitionFilter (directory pruning), not a data filter."""
    import re

    from streaming_data_pipeline_azure_spark.sources.bucketing import (
        write_partitioned,
    )

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    path = str(tmp_path / "by_segment")
    write_partitioned(
        customer, path,
        partition_cols=["c_mktsegment"], sort_within=["c_custkey"],
    )
    df = spark.read.parquet(path).filter("c_mktsegment = 'BUILDING'")
    plan = physical_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "c_mktsegment" in m.group(1), plan
    # correctness: same rows as filtering the unpartitioned table
    want = customer.filter("c_mktsegment = 'BUILDING'").count()
    assert df.count() == want
    # layout: one file per partition directory (plus metadata), not
    # tasks x partitions fragments
    import glob, os
    parts = glob.glob(os.path.join(path, "c_mktsegment=*"))
    assert parts
    for p in parts:
        files = [f for f in os.listdir(p) if f.endswith(".parquet")]
        assert len(files) == 1, (p, files)


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered files must cover compact ranges in BOTH columns; a
    linear sort on x leaves y's per-file span at ~the global span. Also
    a roundtrip row-equality check (layout must not lose rows)."""
    import glob

    from streaming_data_pipeline_azure_spark.sources.bucketing import (
        write_zordered,
    )

    n = 10000
    df = spark.range(n).selectExpr(
        "id", "CAST(id % 1000 AS DOUBLE) AS x",
        "CAST((id * 7) % 1000 AS DOUBLE) AS y",
    )
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, zorder_cols=["x", "y"], n_files=8)
    assert spark.read.parquet(zpath).count() == n

    lpath = str(tmp_path / "linear")
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(lpath)

    def avg_spans(path):
        files = sorted(glob.glob(f"{path}/part-*.parquet"))
        spans_x, spans_y = [], []
        for f in files:
            r = (
                spark.read.parquet(f)
                .selectExpr(
                    "max(x) - min(x) AS sx", "max(y) - min(y) AS sy"
                )
                .collect()[0]
            )
            spans_x.append(r["sx"])
            spans_y.append(r["sy"])
        return sum(spans_x) / len(spans_x), sum(spans_y) / len(spans_y)

    zx, zy = avg_spans(zpath)
    lx, ly = avg_spans(lpath)
    # z-order: both dimensions compact (< 55% of the 999 global span)
    assert zx < 550 and zy < 550, (zx, zy)
    # linear: the non-leading dimension stays essentially global
    assert ly > 900, ly
    # and z-order's y-span must beat linear's by a wide margin
    assert zy < ly / 2


def test_zorder_layout_actually_skips_on_2d_predicate(spark, tmp_path):
    """Metrics-backed skipping evidence (VERDICT r7 #7): a 2-D box
    predicate over the z-ordered layout must let parquet row-group
    pruning drop most data BEFORE the scan emits rows, while the
    linear-sort layout prunes only on its leading column. Measured via
    the scan's numOutputRows (rows surviving min/max pruning), not
    just per-file span statistics."""
    from streaming_data_pipeline_azure_spark.plans.inspect import (
        scan_output_rows,
    )
    from streaming_data_pipeline_azure_spark.sources.bucketing import (
        write_zordered,
    )

    n = 40000
    # y must be INDEPENDENT of x (id*7 % 1000 is a pure function of
    # id % 1000 — a linear x-sort would cluster it for free)
    df = spark.range(n).selectExpr(
        "id", "CAST(id % 1000 AS DOUBLE) AS x",
        "CAST(abs(xxhash64(id)) % 1000 AS DOUBLE) AS y",
    )
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, zorder_cols=["x", "y"], n_files=64)
    lpath = str(tmp_path / "linear")
    df.repartitionByRange(64, "x").sortWithinPartitions("x").write.parquet(
        lpath
    )
    # 2-D box: the z layout prunes on BOTH dims (tiles), the linear
    # layout only on its leading x (slabs) — fewer scanned rows
    box = "x >= 100 AND x < 200 AND y >= 100 AND y < 200"
    zb = scan_output_rows(spark.read.parquet(zpath).filter(box))
    lb = scan_output_rows(spark.read.parquet(lpath).filter(box))
    match = spark.read.parquet(zpath).filter(box).count()
    assert match == spark.read.parquet(lpath).filter(box).count()
    assert zb < lb, (zb, lb)
    assert zb >= match and lb >= match
    # non-leading-dim predicate: the linear sort CANNOT prune y at all
    # (scans ~everything); the z layout skips the files outside the
    # y-band — the defining z-order property
    yband = "y >= 100 AND y < 200"
    zy = scan_output_rows(spark.read.parquet(zpath).filter(yband))
    ly = scan_output_rows(spark.read.parquet(lpath).filter(yband))
    assert ly > n * 3 // 4, ly
    assert zy < ly // 2, (zy, ly)


def test_write_sized_files_targets_file_size(spark, tmp_path):
    """Tiny target -> many files scaled to measured bytes/row; huge
    target -> one file; empty frame -> one file; rows survive intact."""
    import glob

    from streaming_data_pipeline_azure_spark.sources.bucketing import (
        write_sized_files,
    )

    df = spark.range(60_000).selectExpr(
        "id", "CAST(id AS STRING) AS s", "id * 1.5 AS v"
    )
    small = str(tmp_path / "small_target")
    n = write_sized_files(df, small, target_file_mb=1, sample_rows=5000)
    files = glob.glob(f"{small}/part-*.parquet")
    assert len(files) == n
    assert spark.read.parquet(small).count() == 60_000
    total_mb = sum(__import__("os").path.getsize(f) for f in files) / 2**20
    # average file size within [0.3x, 2x] of the 1 MB target
    assert 0.3 <= total_mb / n <= 2.0, (total_mb, n)

    big = str(tmp_path / "big_target")
    assert write_sized_files(df, big, target_file_mb=1024) == 1
    assert len(glob.glob(f"{big}/part-*.parquet")) == 1

    empty = str(tmp_path / "empty_target")
    assert write_sized_files(df.filter("id < 0"), empty) == 1


def test_zorder_key_four_columns_stays_in_sign_safe_range(spark):
    """4+ columns at the default 16 bits would overflow a long's 63
    value bits; bits must auto-reduce so keys are non-negative and the
    layout still clusters (ADVICE r5)."""
    from streaming_data_pipeline_azure_spark.sources.bucketing import (
        zorder_key,
    )
    import pyspark.sql.functions as F
    import pytest

    df = spark.range(2000).selectExpr(
        "CAST(id % 100 AS DOUBLE) AS a",
        "CAST((id * 3) % 100 AS DOUBLE) AS b",
        "CAST((id * 7) % 100 AS DOUBLE) AS c",
        "CAST((id * 11) % 100 AS DOUBLE) AS d",
    )
    z = zorder_key(
        ["a", "b", "c", "d"], [0, 0, 0, 0], [99, 99, 99, 99]
    )
    stats = df.select(z.alias("z")).agg(
        F.min("z").alias("lo"), F.max("z").alias("hi"),
        F.countDistinct("z").alias("n"),
    ).collect()[0]
    # 4 dims -> 15 bits each -> 60-bit key: non-negative, under 2^60
    assert 0 <= stats["lo"] <= stats["hi"] < (1 << 60)
    # id % 100 drives all four columns -> exactly 100 distinct input
    # tuples, and the reduced-bits key must still separate all of them
    assert stats["n"] == 100

    # 64+ dims cannot fit at all -> loud error, not silent wraparound
    with pytest.raises(ValueError, match="cannot fit"):
        zorder_key(["a"] * 64, [0] * 64, [99] * 64)


def test_write_range_sorted_produces_disjoint_ordered_files(spark, tmp_path):
    """Global order, file by file: every file is internally sorted and
    the per-file [min, max] key ranges are pairwise disjoint and
    ordered — so a merge-reader (or a curriculum loader) can stream
    the dataset in key order without any further sort; and the plan
    range-partitions (samples boundaries) rather than funneling
    through one task."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.sources.bucketing import (
        write_range_sorted,
    )

    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 10_000).alias("k"),
        F.col("id").alias("v"),
    )
    path = str(tmp_path / "sorted")
    write_range_sorted(df, path, ["k"], n_files=8)

    back = spark.read.parquet(path).select(
        "k", F.input_file_name().alias("f")
    )
    per_file = {
        r["f"]: (r["mn"], r["mx"])
        for r in back.groupBy("f")
        .agg(F.min("k").alias("mn"), F.max("k").alias("mx"))
        .collect()
    }
    assert len(per_file) == 8
    spans = sorted(per_file.values())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint and ordered ranges

    # internal order: rows of one file are non-decreasing in k
    one = sorted(per_file)[0]
    ks = [r["k"] for r in back.filter(F.col("f") == one).collect()]
    assert ks == sorted(ks)

    plan = (
        df.repartitionByRange(8, "k")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "rangepartitioning" in plan.lower(), plan
