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
