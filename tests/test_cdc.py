from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators import cdc


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _feed(spark):
    # (key, seq, op, payload) — delivered OUT of seq order on purpose
    rows = [
        (1, 3, "U", "c"),
        (1, 1, "I", "a"),
        (1, 2, "U", "b"),
        (2, 1, "I", "x"),
        (2, 2, "D", None),
        (3, 1, "I", "p"),
        (3, 2, "D", None),
        (3, 3, "U", "q"),  # resurrect after delete
    ]
    return spark.createDataFrame(rows, "k int, seq int, op string, v string")


def test_apply_changes_latest_wins_and_deletes(spark):
    snap = cdc.apply_changes(
        _feed(spark), key_cols=["k"], seq_cols=["seq"], op_col="op"
    )
    got = {(r["k"], r["seq"], r["v"]) for r in snap.collect()}
    # key 1: latest is seq 3; key 2: latest is a delete -> absent;
    # key 3: delete shadowed by the later upsert -> resurrected
    assert got == {(1, 3, "c"), (3, 3, "q")}
    assert "op" not in snap.columns and "__rn" not in snap.columns


def test_apply_changes_prefix_replay_idempotent(spark):
    full = _feed(spark)
    prefix = full.filter(F.col("seq") <= 2)
    replayed = cdc.apply_changes(
        prefix.union(full), key_cols=["k"], seq_cols=["seq"], op_col="op"
    )
    direct = cdc.apply_changes(
        full, key_cols=["k"], seq_cols=["seq"], op_col="op"
    )
    # duplicated-prefix delivery must not change the snapshot... except
    # row_number over duplicate (key, seq) pairs is arbitrary among the
    # duplicates — which are identical rows, so the OUTPUT is still equal
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, direct.collect())
    )


def _versions(spark):
    rows = [
        # key 1: x,x,y,y,x -> intervals x[1,3) y[3,5) x[5,)
        (1, _ts(1), "x"),
        (1, _ts(2), "x"),
        (1, _ts(3), "y"),
        (1, _ts(4), "y"),
        (1, _ts(5), "x"),
        # key 2: single version
        (2, _ts(1), "z"),
        # key 3: NULL transitions — NULL,NULL,w -> NULL[1,3) w[3,)
        (3, _ts(1), None),
        (3, _ts(2), None),
        (3, _ts(3), "w"),
    ]
    return spark.createDataFrame(rows, "k int, at timestamp, status string")


def test_scd2_intervals_and_current_flag(spark):
    hist = cdc.scd2_history(
        _versions(spark), key_cols=["k"], seq_col="at", attr_cols=["status"]
    )
    got = {
        (r["k"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in hist.collect()
    }
    assert got == {
        (1, "x", _ts(1), _ts(3), False),
        (1, "y", _ts(3), _ts(5), False),
        (1, "x", _ts(5), None, True),
        (2, "z", _ts(1), None, True),
        (3, None, _ts(1), _ts(3), False),
        (3, "w", _ts(3), None, True),
    }


def test_scd2_partition_invariance(spark):
    df = _versions(spark)
    a = cdc.scd2_history(
        df.repartition(7), key_cols=["k"], seq_col="at", attr_cols=["status"]
    )
    b = cdc.scd2_history(
        df.coalesce(1), key_cols=["k"], seq_col="at", attr_cols=["status"]
    )
    key = lambda rows: sorted(map(repr, rows))
    assert key(a.collect()) == key(b.collect())


def test_scd2_single_exchange(spark):
    """The lag (change-detect) and lead (valid_to) windows share one
    partitioning+ordering: the physical plan must contain exactly one
    Exchange for the window sort."""
    plan = cdc.scd2_history(
        _versions(spark), key_cols=["k"], seq_col="at", attr_cols=["status"]
    )._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_apply_changes_matches_sink_replay(spark, tmp_path):
    """The relational apply_changes over a full feed must equal
    replaying the same feed in sequence order through the serving
    sink's keyed upsert + delete-horizon machinery — the batch and
    streaming formulations of CDC apply agree row-for-row."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.sources.sinks import (
        ParquetUpsertSink,
    )

    feed = _feed(spark)
    sink = ParquetUpsertSink(str(tmp_path / "cdc_sink"), key="k")
    for seq in sorted(r["seq"] for r in feed.select("seq").distinct().collect()):
        batch = feed.filter(F.col("seq") == seq)
        dels = [r["k"] for r in batch.filter(F.col("op") == "D").collect()]
        ups = batch.filter(F.col("op") != "D").select("k", "v")
        if ups.count():
            sink.write_batch(ups, batch_id=seq)
        if dels:
            sink.delete_keys(spark, dels, batch_id=seq)
    served = {(r["k"], r["v"]) for r in sink.read(spark).collect()}
    batch_form = {
        (r["k"], r["v"])
        for r in cdc.apply_changes(
            feed, key_cols=["k"], seq_cols=["seq"], op_col="op"
        ).select("k", "v").collect()
    }
    assert served == batch_form == {(1, "c"), (3, "q")}


def test_apply_changes_null_op_is_upsert_not_delete(spark):
    """A NULL op marker must keep the key visible (malformed feed row
    read as an upsert), never silently read as a delete (ADVICE r5)."""
    feed = spark.createDataFrame(
        [(1, 1, "U", "a"), (1, 2, None, "b"), (2, 1, "U", "x"), (2, 2, "D", None)],
        "k int, seq int, op string, v string",
    )
    snap = cdc.apply_changes(
        feed, key_cols=["k"], seq_cols=["seq"], op_col="op"
    )
    got = {(r["k"], r["v"]) for r in snap.collect()}
    # key 1's latest row has op NULL -> survives with its payload;
    # key 2's latest row is a real delete -> absent
    assert got == {(1, "b")}
