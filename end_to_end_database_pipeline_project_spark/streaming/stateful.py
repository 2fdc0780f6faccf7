"""Stateful / windowed streaming generalizations (SURVEY.md §2.10).

The reference's only window is the hourly tumbling bucket
(``toStartOfHour``, clickhouse_etl.py:321). The generalization targets
over the driver's ``events`` table:

- **sliding windows** — ``F.window(ts, size, slide)``; an event lands in
  size/slide buckets, state is bounded by the watermark;
- **session windows** — ``F.session_window(ts, gap)``; variable-length
  per-key windows merged by the state store as events arrive;
- **arbitrary stateful ops** — ``applyInPandasWithState``: user code +
  explicit per-key state, the escape hatch when no built-in window
  shape fits (running per-user totals here).

Scale notes: all three shuffle once on the grouping key; state-store
footprint is (keys x open windows) and is bounded by the watermark for
the window forms. ``applyInPandasWithState`` state must stay small per
key (a pair of scalars here) — unbounded per-key state is the classic
streaming OOM.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sliding_window_agg(
    events: DataFrame,
    size: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping (hopping) windows over the event stream: each event
    contributes to size/slide windows. Window starts align to epoch
    multiples of the slide, so the batch oracle is a per-event unnest of
    its window starts."""
    return (
        events.withWatermark("ts", watermark)
        .where(F.col("value").isNotNull())
        .groupBy(F.window("ts", size, slide).alias("win"))
        .agg(
            F.avg("value").alias("avg_value"),
            F.count(F.lit(1)).alias("observation_count"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "avg_value",
            "observation_count",
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows: a session extends while successive
    events arrive strictly within ``gap`` of the last one; the window is
    [first_ts, last_ts + gap). The batch equivalent is the
    gaps-and-islands pattern (lag + cumulative break-sum)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def _user_totals_fn(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user (count, sum-of-non-null-values); emits the
    running totals once per batch the key appears in."""
    cnt, tot = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        cnt += len(pdf)
        tot += float(pdf["value"].fillna(0.0).sum())
    state.update((cnt, tot))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [cnt], "total_value": [tot]})


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary-stateful running totals via ``applyInPandasWithState``
    — per-key state survives across micro-batches; the sink (update
    mode) holds one row per (key, batch), so the *final* totals are the
    max-count row per key."""
    return events.groupBy("user_id").applyInPandasWithState(
        _user_totals_fn,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _UserTotalsProcessor:
    """StatefulProcessor for transformWithStateInPandas (defined without
    the base class at import time so module import never depends on the
    streaming submodule; the base is mixed in lazily below)."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", "n bigint, total double")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self._state.get() if self._state.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """Running per-user totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-stateful API: typed state handles (ValueState /
    ListState / MapState), timers, and TTL replace the single untyped
    tuple of ``applyInPandasWithState``. Same semantics as
    ``stateful_user_totals``; requires the RocksDB state store
    (changelog-checkpointed at scale), which the caller enables on the
    session before starting the query.

    The API's streaming Python runner needs ``google.protobuf``. Where
    the real wheel is installed (pyspark[connect] clusters) it is used
    as-is; in wheel-less containers the vendored mini runtime
    (``_vendor/protobuf_shim``) is activated and shipped to Python
    workers via addPyFile, so the state-server protocol round-trips
    end-to-end either way (pinned by
    tests/test_pipeline_streaming.py::test_transform_with_state_agrees
    and the protobuf-shim unit suite)."""
    from .._vendor import ensure_protobuf

    ensure_protobuf(events.sparkSession)
    from pyspark.sql.streaming import StatefulProcessor

    proc_cls = type("UserTotalsProcessor", (_UserTotalsProcessor, StatefulProcessor), {})
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


_SESSION_GAP_MS = 30 * 60 * 1000


def _session_expiry_fn(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user gap sessionization with event-time timeout. Input rows
    (assumed time-ordered across batches, as a chronological landing
    feed delivers them) are walked in timestamp order: a gap > GAP
    CLOSES the current session and starts the next, so batch packing
    does not change the output — sessions split identically whether the
    two bursts share a micro-batch or not. The final open session stays
    in state until the watermark passes last_ts + gap, then the timeout
    fires (an invocation with no input rows) and it is emitted exactly
    once."""

    def emit(n, total, first_ts, last_ts):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "session_start_ms": [first_ts],
                "session_end_ms": [last_ts + _SESSION_GAP_MS],
            }
        )

    if state.hasTimedOut:
        n, total, first_ts, last_ts = state.get
        state.remove()
        yield emit(n, total, first_ts, last_ts)
        return

    n, total, first_ts, last_ts = state.get if state.exists else (0, 0.0, None, None)
    rows = []
    for pdf in pdfs:
        ts_ms = pdf["ts"].astype("int64") // 1_000_000
        vals = pdf["value"].fillna(0.0)
        rows.extend(zip(ts_ms.tolist(), vals.tolist()))
    rows.sort()
    for ts, val in rows:
        if last_ts is not None and ts - last_ts > _SESSION_GAP_MS:
            yield emit(n, total, first_ts, last_ts)
            n, total, first_ts = 0, 0.0, None
        n += 1
        total += float(val)
        first_ts = ts if first_ts is None else first_ts
        last_ts = ts
    state.update((n, total, first_ts, last_ts))
    state.setTimeoutTimestamp(last_ts + _SESSION_GAP_MS)


def stateful_sessions_with_timeout(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom sessionization via explicit state + EventTimeTimeout: the
    state-store TTL mechanism ``session_window`` uses internally, made
    explicit — state holds (count, sum, first_ts, last_ts) per user and
    is REMOVED when its timeout fires, so store size is bounded by
    (open sessions), not (all keys ever seen). The timeout-driven
    emit-once-on-close is the pattern for any custom windowing scheme
    no built-in window expresses."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_expiry_fn,
            outputStructType=(
                "user_id bigint, n_events bigint, total_value double, "
                "session_start_ms bigint, session_end_ms bigint"
            ),
            stateStructType="n bigint, total double, first_ts bigint, last_ts bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
