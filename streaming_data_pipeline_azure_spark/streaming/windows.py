"""Streaming windowed aggregations and custom stateful operators.

The reference pipeline itself declares no temporal operators (SURVEY.md
§2.2: no tumbling/hopping/session windows, no watermark — the order payload
has no timestamp, orders-generator/main.go:104-108). These operators extend
the engine to the windowed/stateful surface a production event pipeline
needs, expressed with Structured Streaming's native incremental operators
so state lives in the state store (RocksDB-able), not in Python:

- :func:`windowed_counts` — watermarked tumbling/hopping window per
  event_type. Late rows beyond the watermark are dropped by the state
  store; append mode emits each window exactly once when the watermark
  passes its end.
- :func:`sessionized_counts` — per-user session windows
  (``F.session_window``), gap-based, merged incrementally.
- :func:`running_user_stats` — custom stateful operator via
  ``applyInPandasWithState``: per-user running count/total maintained in
  explicit state, emitted as an update stream. The kernel is Arrow-batched
  per group; state is a fixed-width tuple, so state-store traffic is bytes
  per user, not rows.

At 100 TB scale: all three shuffle once on their grouping key per
micro-batch; watermarks bound state size (windows expire, sessions close),
and `running_user_stats` state is O(distinct users). Skewed keys are the
usual hazard — AQE does not apply inside streaming stateful exchanges, so
a hot user_id should be pre-salted upstream if one exists.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Driver testdata `events` shape (TESTDATA.md).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Test-harness streaming source: JSON event files become micro-batches
    with the explicit EVENT_SCHEMA (never inferred)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )


def windowed_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling (or hopping, when ``slide`` is given) window
    aggregation per event_type.

    One shuffle on (window, event_type); partial aggregation runs map-side
    before the exchange. Rows later than ``watermark_delay`` behind the max
    observed event time are dropped by the state store, which is what
    bounds state at scale."""
    windowed = events.withWatermark("ts", watermark_delay).groupBy(
        F.window("ts", window_duration, slide or window_duration).alias("w"),
        "event_type",
    )
    return windowed.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


def sessionized_counts(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key session windows: events within ``gap`` of each other merge
    into one session; a session closes (and emits, in append mode) when the
    watermark passes its end. Native ``session_window`` keeps the merge
    logic in the JVM state store."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("s"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col(f"s.start").alias("session_start"),
            F.col(f"s.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drops re-deliveries of the same key within
    the watermark horizon (``dropDuplicatesWithinWatermark``), turning an
    at-least-once source into an effectively-once stream ahead of any
    aggregation. State = one entry per key seen inside the horizon, then
    evicted — unlike plain ``dropDuplicates`` on a stream, which keeps
    every key forever and OOMs at 100 TB."""
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: tuple[str, str],
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark_delay: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with a time-range bound: right rows within
    ``[left_ts - within, left_ts]`` of the left row (funnel-attribution
    shape: purchases joined to the clicks that preceded them).

    The reference pipeline has no stream-stream join (its ASA job joins
    stream to static reference data only, and ASA stream-stream joins
    would require DATEDIFF bounds — SURVEY.md §2.2); this extends the
    engine to that class. Both sides carry watermarks and the join
    condition bounds event-time distance, which is what lets the state
    store EVICT buffered rows — an unbounded stream-stream join would
    hold both streams forever. State per key ≈ rows inside the
    ``within + watermark_delay`` horizon. Column names must be disjoint
    across the two sides (rename before calling)."""
    lk, rk = on
    l = left.withWatermark(left_ts, watermark_delay)
    r = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (l[lk] == r[rk])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {within}"))
        & (r[right_ts] <= l[left_ts])
    )
    return l.join(r, cond, how)


RUNNING_STATS_SCHEMA = "user_id long, n_events long, total_value double"
_RUNNING_STATE_SCHEMA = "n long, total double"


def _running_stats_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: fold this micro-batch's rows for one user into the
    (count, total) state tuple and emit the updated running totals."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += int(len(pdf))
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running event count and value total, emitted as an update stream.

    State is a fixed 16-byte tuple per user — the state store holds
    O(distinct users), never raw events. Use with
    ``outputMode("update")``."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_stats_fn,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """The same running per-user aggregate on the modern
    ``transformWithStateInPandas`` API (Spark 4 ``StatefulProcessor`` —
    the successor of applyInPandasWithState): typed ValueState, explicit
    lifecycle, composable timers. Requires the RocksDB state store
    provider (``spark.sql.streaming.stateStore.providerClass``) — which
    is also the right provider at scale: state lives off-heap/on-disk
    with incremental checkpointing instead of in executor heap.

    The TWS wire protocol needs ``google.protobuf``; environments without
    it (like this container) must use :func:`running_user_stats`
    (applyInPandasWithState) — identical semantics."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf (not "
            "installed here); use running_user_stats() instead"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", _RUNNING_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += int(len(pdf))
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=RUNNING_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
