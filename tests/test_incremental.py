from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators.incremental import (
    IncrementalAgg,
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )


def _direct(df):
    sum_d = F.sum(F.col("v").cast("decimal(28,4)")).cast("double")
    n_d = F.count(F.lit(1)).cast("double")
    sumsq_d = F.sum(
        F.col("v").cast("decimal(18,4)") * F.col("v").cast("decimal(18,4)")
    ).cast("decimal(38,8)").cast("double")
    var = sumsq_d / n_d - (sum_d / n_d) * (sum_d / n_d)
    return df.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        sum_d.alias("total"),
        (sum_d / n_d).alias("avg_value"),
        F.min("v").alias("min_value"),
        F.max("v").alias("max_value"),
        var.alias("var_value"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("stddev_value"),
    )


def test_refresh_equals_full_recompute(spark, tmp_path):
    """build(A) + refresh(B) + refresh(C) must serve exactly the full
    recompute over A∪B∪C — bit-for-bit (decimal partials)."""
    view = IncrementalAgg(str(tmp_path / "agg"), ["g"], "v")
    view.build(_rows(spark, 0, 100))
    view.refresh(_rows(spark, 100, 250))
    view.refresh(_rows(spark, 250, 400))
    served = sorted(map(tuple, view.read(spark).collect()))
    direct = sorted(map(tuple, _direct(_rows(spark, 0, 400)).collect()))
    assert served == direct


def test_compact_preserves_and_collapses(spark, tmp_path):
    view = IncrementalAgg(str(tmp_path / "agg2"), ["g"], "v")
    view.build(_rows(spark, 0, 100))
    view.refresh(_rows(spark, 100, 200))
    before = sorted(map(tuple, view.read(spark).collect()))
    assert view.stats(spark)["n_partial_rows"] == 6  # 3 groups x 2 folds
    view.compact(spark)
    st = view.stats(spark)
    assert st["n_partial_rows"] == 3 and st["generation"] == 1
    after = sorted(map(tuple, view.read(spark).collect()))
    assert after == before
    # refresh keeps working post-compact
    view.refresh(_rows(spark, 200, 300))
    served = sorted(map(tuple, view.read(spark).collect()))
    direct = sorted(map(tuple, _direct(_rows(spark, 0, 300)).collect()))
    assert served == direct


def test_params_guard_and_load(spark, tmp_path):
    view = IncrementalAgg(str(tmp_path / "agg3"), ["g"], "v")
    view.build(_rows(spark, 0, 50))
    other = IncrementalAgg(view.path, ["g"], "other_col")
    with pytest.raises(ValueError, match="params mismatch"):
        other.refresh(_rows(spark, 50, 60))
    reloaded = IncrementalAgg.load(spark, view.path)
    assert reloaded.value_col == "v"
    assert reloaded.read(spark).count() == 3


def test_streaming_refresh_parity(spark, tmp_path):
    """Micro-batched foreachBatch refresh of the view must serve the
    same result as one batch build over all the data — the partials are
    mergeable, so batch boundaries cannot matter."""
    view = IncrementalAgg(str(tmp_path / "agg_stream"), ["g"], "v")
    view.build(_rows(spark, 0, 50))

    src = tmp_path / "in"
    src.mkdir()
    _rows(spark, 50, 200).repartition(3).write.json(str(src / "files"))
    stream = (
        spark.readStream.schema("g string, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "files"))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, bid: view.refresh(batch)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    if q.exception() is not None:
        raise q.exception()
    assert view.stats(spark)["n_partial_rows"] > 6  # several micro-batches
    served = sorted(map(tuple, view.read(spark).collect()))
    direct = sorted(map(tuple, _direct(_rows(spark, 0, 200)).collect()))
    assert served == direct


def test_pre_sumsq_layout_still_serves(spark, tmp_path):
    """Views persisted before the __sumsq partial existed (r5 layouts)
    must keep serving — without the variance columns — instead of
    failing on the missing column."""
    view = IncrementalAgg(str(tmp_path / "agg_legacy"), ["g"], "v")
    view.build(_rows(spark, 0, 100))
    # rewrite the live generation in the r5 schema (no __sumsq)
    path = view._partials_path(spark)
    legacy = spark.read.parquet(path).drop("__sumsq")
    legacy.write.mode("overwrite").parquet(str(tmp_path / "legacy_tmp"))
    spark.read.parquet(str(tmp_path / "legacy_tmp")).write.mode(
        "overwrite"
    ).parquet(path)
    served = view.read(spark)
    assert "var_value" not in served.columns
    got = {r["g"]: r["n"] for r in served.collect()}
    assert sum(got.values()) == 100


def test_incremental_join_view_matches_one_shot_join(spark, tmp_path):
    """Batched delta refreshes (left-only, right-only, both-sides) must
    serve the IDENTICAL multiset a one-shot join of the full inputs
    produces — including the ΔL⋈ΔR corner (same-refresh arrivals on
    both sides must pair up)."""
    from streaming_data_pipeline_azure_spark.operators.incremental import (
        IncrementalJoinView,
    )

    L = [(k, f"l{k}_{i}") for k in range(20) for i in range(2)]
    R = [(k, k * 10) for k in range(15)] + [(3, 999), (40, 1)]
    left = spark.createDataFrame(L, "k long, lv string")
    right = spark.createDataFrame(R, "k long, rv long")

    view = IncrementalJoinView(str(tmp_path / "ijv"), "k")
    view.build(
        left.filter("k % 4 = 0"), right.filter("k % 3 = 0")
    )
    view.refresh(delta_left=left.filter("k % 4 = 1"))
    view.refresh(delta_right=right.filter("k % 3 = 1"))
    view.refresh(
        delta_left=left.filter("k % 4 > 1"),
        delta_right=right.filter("k % 3 = 2"),
    )

    got = sorted(tuple(r) for r in view.read(spark).collect())
    want = sorted(tuple(r) for r in left.join(right, "k").collect())
    assert got == want and len(got) > 0

    # reopen via load(), empty-delta refresh is a no-op
    reopened = IncrementalJoinView.load(spark, str(tmp_path / "ijv"))
    reopened.refresh()
    assert sorted(tuple(r) for r in reopened.read(spark).collect()) == want


def test_incremental_join_view_prunes_state_buckets(spark, tmp_path):
    """A refresh must read only the state buckets the delta's keys hash
    into: the state scan's plan carries a PartitionFilters entry on the
    __kb directory column, and a one-key delta reads exactly one
    bucket's rows."""
    from streaming_data_pipeline_azure_spark.operators.incremental import (
        IncrementalJoinView,
    )
    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    left = spark.createDataFrame(
        [(k, f"l{k}") for k in range(200)], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(k, k) for k in range(200)], "k long, rv long"
    )
    view = IncrementalJoinView(str(tmp_path / "ijv2"), "k", n_buckets=32)
    view.build(left, right)

    delta = spark.createDataFrame([(7, "new7")], "k long, lv string")
    pruned = view._pruned_state(spark, "right", delta)
    plan = physical_plan(pruned)
    assert "PartitionFilters" in plan and "__kb" in plan, plan
    rows = pruned.collect()
    assert 0 < len(rows) < 200  # one bucket of 32, never the full state
    assert {r["__kb"] for r in rows} == {rows[0]["__kb"]}

    import pytest as _pytest
    with _pytest.raises(ValueError):  # overlapping non-key columns
        IncrementalJoinView(str(tmp_path / "bad"), "k").build(
            left, right.withColumnRenamed("rv", "lv")
        )
    with _pytest.raises(ValueError):  # params mismatch
        IncrementalJoinView(str(tmp_path / "ijv2"), "other").read(spark)


def test_incremental_join_view_compaction_preserves_rows_and_replay(
    spark, tmp_path
):
    """compact() must collapse the per-refresh file accretion (fewer
    files per side), preserve the view EXACTLY (rows AND batch
    stamps), and keep a replayed streaming micro-batch idempotent
    afterwards — the original __batch partitions survive, so the
    replay's overwrite target still exists."""
    import glob

    from streaming_data_pipeline_azure_spark.operators.incremental import (
        IncrementalJoinView,
    )

    left = spark.createDataFrame(
        [(k, f"l{k}") for k in range(40)], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(40)], "k long, rv long"
    )
    view = IncrementalJoinView(str(tmp_path / "cjv"), "k", n_buckets=8)
    view.build(left.filter("k < 10"), right)
    for bid, lo in ((0, 10), (1, 20), (2, 30)):
        # many input partitions per delta -> several files per bucket
        # dir (each task writes one file per directory it holds)
        view.refresh(
            delta_left=(
                left.filter(f"k >= {lo} - 10 and k < {lo}")
                if lo > 10
                else left.filter("k >= 10 and k < 20")
            ).repartition(6),
            batch_id=bid,
        )

    def nfiles():
        return len(
            glob.glob(str(tmp_path / "cjv" / "view" / "gen=*" / "**" / "*.parquet"),
                      recursive=True)
        )

    before_rows = sorted(tuple(r) for r in view.read(spark).collect())
    before_files = nfiles()
    # r13-opt: refresh co-locates each bucket before the partitioned
    # write (one shuffle of the delta), so a 6-partition delta no longer
    # fans out 6 files per (batch, bucket) directory — the accretion
    # compact() used to collapse is prevented AT WRITE TIME. Pin that:
    # one file per populated (batch, bucket) view directory.
    import os

    per_dir: dict[str, int] = {}
    for f in glob.glob(
        str(tmp_path / "cjv" / "view" / "gen=*" / "**" / "*.parquet"),
        recursive=True,
    ):
        per_dir[os.path.dirname(f)] = per_dir.get(os.path.dirname(f), 0) + 1
    assert per_dir and max(per_dir.values()) == 1
    view.compact(spark)
    assert nfiles() <= before_files
    assert sorted(tuple(r) for r in view.read(spark).collect()) == before_rows

    # replay micro-batch 2 after compaction: view unchanged
    view.refresh(
        delta_left=left.filter("k >= 20 and k < 30"), batch_id=2
    )
    assert sorted(tuple(r) for r in view.read(spark).collect()) == before_rows


def test_incremental_join_view_takedown_tombstones(spark, tmp_path):
    """Derived views are where forgotten data hides: delete(key) must
    hide every view row for that key immediately, compact() must drop
    it from all three persisted sides physically and clear the set,
    and a post-compaction re-insert is live again. Also duck-type
    compatible with takedown.forget_documents (delete + compact)."""
    import glob

    from streaming_data_pipeline_azure_spark.operators.incremental import (
        IncrementalJoinView,
    )

    left = spark.createDataFrame(
        [(k, f"l{k}") for k in range(10)], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(10)], "k long, rv long"
    )
    view = IncrementalJoinView(str(tmp_path / "tjv"), "k", n_buckets=4)
    view.build(left, right)

    view.delete(spark, [3, 7])
    keys = {r["k"] for r in view.read(spark).collect()}
    assert keys == set(range(10)) - {3, 7}

    view.compact(spark)
    assert {r["k"] for r in view.read(spark).collect()} == keys
    # physically gone from every side, tombstones cleared
    for side in ("left", "right", "view"):
        files = glob.glob(
            str(tmp_path / "tjv" / side / "gen=*" / "**" / "*.parquet"),
            recursive=True,
        )
        vals = {r["k"] for r in spark.read.parquet(*files).collect()}
        assert 3 not in vals and 7 not in vals, side
    assert not glob.glob(str(tmp_path / "tjv" / "tombstones" / "*"))

    # post-compaction re-insert: BOTH sides must re-supply the key —
    # its dimension row was forgotten too (a left-only delta finds no
    # match, by design)
    view.refresh(delta_left=spark.createDataFrame(
        [(3, "back")], "k long, lv string"))
    assert 3 not in {r["k"] for r in view.read(spark).collect()}
    view.refresh(
        delta_left=spark.createDataFrame([(3, "back2")], "k long, lv string"),
        delta_right=spark.createDataFrame([(3, 30)], "k long, rv long"),
    )
    live = {tuple(r) for r in view.read(spark).collect()}
    assert (3, "back", 30) in live and (3, "back2", 30) in live


def test_incremental_topk_matches_full_recompute(spark, tmp_path):
    """Candidate folds + compaction serve the exact top-k at every
    lifecycle point; reload from params round-trips; k>=1 enforced."""
    import pytest as _pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.incremental import (
        IncrementalTopK,
    )

    rows = [(i, f"g{i % 3}", float((i * 37) % 101)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, v double")

    def exact(upto):
        sub = df.filter(F.col("id") < upto)
        w = Window.partitionBy("g").orderBy(
            F.col("v").desc(), F.col("id").asc()
        )
        return sorted(
            map(
                tuple,
                sub.withColumn("rank", F.row_number().over(w))
                .filter("rank <= 4")
                .select("g", "id", "v", F.col("rank").cast("long"))
                .collect(),
            )
        )

    view = IncrementalTopK(
        str(tmp_path / "tk"), ["g"], "v", "id", k=4
    )
    view.build(df.filter(F.col("id") < 100))
    assert sorted(map(tuple, view.read(spark).collect())) == exact(100)
    view.refresh(df.filter((F.col("id") >= 100) & (F.col("id") < 200)))
    assert sorted(map(tuple, view.read(spark).collect())) == exact(200)
    view.compact(spark)
    assert view.stats(spark)["n_partial_rows"] == 12  # 3 groups x k
    view.refresh(df.filter(F.col("id") >= 200))
    assert sorted(map(tuple, view.read(spark).collect())) == exact(300)

    # reload-by-params serves identically; param mismatch is loud
    reloaded = IncrementalTopK.load(spark, str(tmp_path / "tk"))
    assert sorted(map(tuple, reloaded.read(spark).collect())) == exact(300)
    other = IncrementalTopK(str(tmp_path / "tk"), ["g"], "v", "id", k=9)
    with _pytest.raises(ValueError, match="params mismatch"):
        other.read(spark)
    with _pytest.raises(ValueError, match="k >= 1"):
        IncrementalTopK(str(tmp_path / "x"), ["g"], "v", "id", k=0)
