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
