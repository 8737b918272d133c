"""Streaming window/watermark/stateful-operator tests.

File-source micro-batches (maxFilesPerTrigger=1, files named in processing
order) drive deterministic watermark advancement: the watermark for batch
N+1 is max(event time seen through batch N) minus the delay, so a "flush"
event far in the future closes earlier windows, and a late event arriving
after the watermark passed its window is dropped by the state store.
"""

from __future__ import annotations

import json
import time

from streaming_data_pipeline_azure_spark.streaming.windows import (
    read_event_file_stream,
    running_user_stats,
    sessionized_counts,
    windowed_counts,
)


def _ev(event_id, ts, user_id=1, event_type="click", value=1.0):
    return {
        "event_id": event_id,
        "ts": ts,
        "user_id": user_id,
        "event_type": event_type,
        "value": value,
        "props": "{}",
    }


def _write_batches(tmp_path, batches):
    src = tmp_path / "events_in"
    src.mkdir()
    for i, batch in enumerate(batches):
        (src / f"b{i:03d}.json").write_text(
            "\n".join(json.dumps(e) for e in batch)
        )
        time.sleep(0.01)  # distinct mtimes -> deterministic batch order
    return str(src)


def _drain(query, timeout=120.0):
    assert query.awaitTermination(timeout), "stream did not drain"
    if query.exception() is not None:
        raise query.exception()


def test_tumbling_window_emits_on_watermark_and_drops_late(spark, tmp_path):
    src = _write_batches(
        tmp_path,
        [
            # window [00:00,01:00): 2 events; window [01:00,02:00): 1 event
            [
                _ev(1, "2024-01-01T00:05:00Z"),
                _ev(2, "2024-01-01T00:20:00Z"),
                _ev(3, "2024-01-01T01:10:00Z"),
            ],
            # advances the watermark to 03:00 (05:00 - 2h) for later batches
            [_ev(4, "2024-01-01T05:00:00Z")],
            # with wm=03:00 this batch EVICTS+EMITS the closed windows
            # (eviction happens at end-of-batch, so the late row below must
            # come one batch later to actually be dropped)
            [_ev(5, "2024-01-01T05:30:00Z")],
            # arrives after the [00:00,01:00) window was evicted -> dropped
            [_ev(6, "2024-01-01T00:30:00Z")],
            # flush: watermark -> 07:00, closes the 05:00 window
            [_ev(7, "2024-01-01T09:00:00Z")],
        ],
    )
    out = windowed_counts(read_event_file_stream(spark, src))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = {
        r["window_start"].isoformat(): r
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert rows["2024-01-01T00:00:00"]["n_events"] == 2  # late row dropped
    assert rows["2024-01-01T01:00:00"]["n_events"] == 1
    assert rows["2024-01-01T05:00:00"]["n_events"] == 2
    # the 09:00 flush window never closed (watermark stops at 07:00)
    assert "2024-01-01T09:00:00" not in rows
    # the state store itself reported the late-row drop
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1


def test_session_windows_merge_and_close(spark, tmp_path):
    src = _write_batches(
        tmp_path,
        [
            # user 1: two events 10 min apart -> one session; then an event
            # 90 min later -> second session (gap 30 min)
            [
                _ev(1, "2024-01-01T00:00:00Z", user_id=1),
                _ev(2, "2024-01-01T00:10:00Z", user_id=1),
                _ev(3, "2024-01-01T01:40:00Z", user_id=1),
            ],
            # flush event for another user closes everything
            [_ev(9, "2024-01-01T10:00:00Z", user_id=2)],
        ],
    )
    out = sessionized_counts(read_event_file_stream(spark, src))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    u1 = [
        r
        for r in spark.sql("SELECT * FROM sess_out").collect()
        if r["user_id"] == 1
    ]
    assert sorted(r["n_events"] for r in u1) == [1, 2]
    two = next(r for r in u1 if r["n_events"] == 2)
    # session extends gap past the last event
    assert two["session_start"].isoformat() == "2024-01-01T00:00:00"
    assert two["session_end"].isoformat() == "2024-01-01T00:40:00"


def test_running_user_stats_keeps_state_across_batches(spark, tmp_path):
    src = _write_batches(
        tmp_path,
        [
            [
                _ev(1, "2024-01-01T00:00:00Z", user_id=1, value=10.0),
                _ev(2, "2024-01-01T00:01:00Z", user_id=2, value=5.0),
            ],
            [_ev(3, "2024-01-01T00:02:00Z", user_id=1, value=2.5)],
        ],
    )
    out = running_user_stats(read_event_file_stream(spark, src))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stats_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = spark.sql("SELECT * FROM stats_out").collect()
    # user 1 appears once per batch; the LAST emission carries running totals
    u1 = max(
        (r for r in rows if r["user_id"] == 1), key=lambda r: r["n_events"]
    )
    assert u1["n_events"] == 2
    assert u1["total_value"] == 12.5
    u2 = next(r for r in rows if r["user_id"] == 2)
    assert (u2["n_events"], u2["total_value"]) == (1, 5.0)


def test_stream_stream_join_within_window(spark, tmp_path):
    """Purchases join clicks by the same user within the preceding hour —
    matches emit; clicks outside the window don't."""
    import pyspark.sql.types as T

    from streaming_data_pipeline_azure_spark.streaming.windows import (
        stream_stream_join,
    )

    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir(), buys_dir.mkdir()
    (clicks_dir / "c0.json").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"c_user": 1, "cts": "2024-01-01T10:00:00Z", "click_id": 100},
                {"c_user": 2, "cts": "2024-01-01T07:00:00Z", "click_id": 200},
            ]
        )
    )
    (buys_dir / "b0.json").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"b_user": 1, "bts": "2024-01-01T10:30:00Z", "buy_id": 7},
                {"b_user": 2, "bts": "2024-01-01T10:30:00Z", "buy_id": 8},
            ]
        )
    )
    cs = T.StructType(
        [
            T.StructField("c_user", T.LongType()),
            T.StructField("cts", T.TimestampType()),
            T.StructField("click_id", T.LongType()),
        ]
    )
    bs = T.StructType(
        [
            T.StructField("b_user", T.LongType()),
            T.StructField("bts", T.TimestampType()),
            T.StructField("buy_id", T.LongType()),
        ]
    )
    buys = spark.readStream.schema(bs).json(str(buys_dir))
    clicks = spark.readStream.schema(cs).json(str(clicks_dir))
    out = stream_stream_join(
        buys, clicks, on=("b_user", "c_user"), left_ts="bts", right_ts="cts",
        within="1 hour",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = spark.sql("SELECT buy_id, click_id FROM ss_join").collect()
    # user1: click 30 min before purchase -> match
    # user2: click 3.5 h before purchase -> outside the 1 h window
    assert {(r["buy_id"], r["click_id"]) for r in rows} == {(7, 100)}


def test_running_user_stats_tws(spark, tmp_path):
    """Same semantics as the applyInPandasWithState operator, on the
    transformWithStateInPandas API (RocksDB state store). Skipped where
    google.protobuf (the TWS wire-protocol dependency) is unavailable."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not installed (TWS wire protocol)")
    from streaming_data_pipeline_azure_spark.streaming.windows import (
        running_user_stats_tws,
    )

    src = _write_batches(
        tmp_path,
        [
            [
                _ev(1, "2024-01-01T00:00:00Z", user_id=1, value=10.0),
                _ev(2, "2024-01-01T00:01:00Z", user_id=2, value=5.0),
            ],
            [_ev(3, "2024-01-01T00:02:00Z", user_id=1, value=2.5)],
        ],
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = running_user_stats_tws(read_event_file_stream(spark, src))
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_out")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    rows = spark.sql("SELECT * FROM tws_out").collect()
    u1 = max((r for r in rows if r["user_id"] == 1), key=lambda r: r["n_events"])
    assert (u1["n_events"], u1["total_value"]) == (2, 12.5)
    u2 = next(r for r in rows if r["user_id"] == 2)
    assert (u2["n_events"], u2["total_value"]) == (1, 5.0)
